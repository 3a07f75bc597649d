package graft

/** C1 — typed string-keyed parameter map, the reference's
  * `efanna2e::Parameters` (`/root/reference/include/efanna2e/parameters.h:13-55`):
  * build/search knobs travel as strings (CLI/YAML) and are read typed at
  * use sites, with defaults. Immutable here (Spark closures capture it).
  */
final case class GraftConfig(entries: Map[String, String] = Map.empty) {

  def set(key: String, value: Any): GraftConfig =
    copy(entries = entries + (key -> value.toString))

  def getInt(key: String, default: Int): Int =
    entries.get(key).map(_.toInt).getOrElse(default)

  def getLong(key: String, default: Long): Long =
    entries.get(key).map(_.toLong).getOrElse(default)

  def getDouble(key: String, default: Double): Double =
    entries.get(key).map(_.toDouble).getOrElse(default)

  def getBoolean(key: String, default: Boolean): Boolean =
    entries.get(key).map(_.toBoolean).getOrElse(default)

  def getString(key: String, default: String): String =
    entries.getOrElse(key, default)

  /** Required-key variant (the reference throws on missing keys too). */
  def require(key: String): String =
    entries.getOrElse(key, throw new IllegalArgumentException(s"missing param $key"))
}

object GraftConfig {

  /** Build-params adapter (the knobs of `build_roargraph_index.sh:27-29`). */
  def buildParams(c: GraftConfig): graft.index.BuildParams =
    graft.index.BuildParams(
      mSq = c.getInt("M_sq", 100),
      mPjbp = c.getInt("M_pjbp", 35),
      lPjpq = c.getInt("L_pjpq", 100),
      metric = c.getString("metric", "cosine"))
}
