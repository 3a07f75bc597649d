package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Generation-pointer MANIFEST — serve-through-compaction isolation
  * for the persisted index faces.
  *
  * The in-place compactions ([[ShardedIndex.compact]],
  * [[graft.operators.InvertedIndex.compactPostings]]) rebuild the live
  * directories under a single-writer QUIESCENCE contract that also
  * excludes READERS: a query listing the live dir mid-swap can fail.
  * That is fine for a batch pipeline and impossible for a serving
  * tier — a real 100 TB deployment compacts WHILE serving. (The
  * reference never faces this: it is a single-process RAM engine,
  * `/root/reference/src/index_bipartite.cpp` builds offline and serves
  * from memory.)
  *
  * This layer fixes it with the standard snapshot trick (the
  * Iceberg/Delta manifest posture, reduced to its minimum):
  *
  *  - `<root>/gen<k>/` — one COMPLETE index per generation. A
  *    generation is immutable once published; a compaction builds its
  *    successor in `gen<k+1>` reading `gen<k>` strictly read-only.
  *  - `<root>/MANIFEST` — one tiny file naming the live generation.
  *    Readers resolve it ONCE per query and then touch only that
  *    generation's files; the pointer flip is one atomic rename, so a
  *    reader sees entirely-old or entirely-new, never a mix.
  *  - Retirement keeps the published generation AND its predecessor
  *    (the GRACE generation a reader holding the pre-publish manifest
  *    may still be scanning); everything older — including partial
  *    dirs from crashed compaction attempts — is deleted at publish.
  *
  * Guarantee: a reader that resolved the manifest before a publish
  * completes correctly through ONE concurrent compaction. A query
  * slow enough to span TWO compactions needs an external gate
  * (refcount/lease) on retirement — out of scope here, the grace
  * window is the standing production posture.
  *
  * Writers stay single-writer among THEMSELVES (append/delete/compact
  * mutually excluded — a delete landing mid-compaction would mask ids
  * in the generation about to be retired); the manifest removes only
  * the reader-vs-compactor restriction, which is the one that matters
  * for serving.
  */
object Generations {

  private val ManifestName = "MANIFEST"
  private val NextName = "MANIFEST__next"
  private val GenRe = "gen(\\d+)".r

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readFile(f: FileSystem, p: Path): Option[String] =
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in).mkString.trim)
      catch { case scala.util.control.NonFatal(_) => None }
      finally in.close()
    }

  /** Recover a [[publish]] that crashed between writing `MANIFEST__next`
    * and promoting it. A VALID committed next (names an existing gen
    * dir) is newer than the live pointer, so it wins; a garbage next (a
    * crash mid-write left a partial/empty file) is dropped and the old
    * pointer keeps serving. Idempotent; tolerates the lost rename race
    * between two concurrent recoverers. */
  private def recover(f: FileSystem, root: String): Unit = {
    val next = new Path(s"$root/$NextName")
    if (!f.exists(next)) return
    val valid = readFile(f, next).exists(g =>
      g.matches("gen\\d+") && f.exists(new Path(s"$root/$g")))
    val live = new Path(s"$root/$ManifestName")
    if (!valid) { f.delete(next, false); return }
    if (f.exists(live)) f.delete(live, false)
    if (!f.rename(next, live))
      require(f.exists(live),
        s"manifest recover: cannot promote ${next.toString}")
  }

  /** Live generation name (e.g. "gen3"), or None before the first
    * publish. Runs crash recovery — every read path heals a stranded
    * pointer swap. */
  def live(spark: SparkSession, root: String): Option[String] = {
    val f = fs(spark, root)
    if (!f.exists(new Path(root))) return None
    recover(f, root)
    readFile(f, new Path(s"$root/$ManifestName"))
      .filter(_.matches("gen\\d+"))
  }

  /** Live generation DIRECTORY, or None before the first publish. */
  def liveDir(spark: SparkSession, root: String): Option[String] =
    live(spark, root).map(g => s"$root/$g")

  /** Allocate the next generation (name, dir): max existing index + 1.
    * Never reuses a crashed attempt's partial dir — those are retired
    * at the next publish, and monotone numbering keeps a half-written
    * dir from ever being mistaken for a fresh build target. */
  def next(spark: SparkSession, root: String): (String, String) = {
    val f = fs(spark, root)
    val p = new Path(root)
    val maxIdx =
      if (!f.exists(p)) -1
      else f.listStatus(p).iterator
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .collect { case GenRe(i) => i.toInt }
        .foldLeft(-1)(math.max)
    val name = s"gen${maxIdx + 1}"
    (name, s"$root/$name")
  }

  /** Atomically point the manifest at `gen` (which must be a complete,
    * committed generation), then retire every other generation dir
    * EXCEPT the immediately-previous live one — the grace generation.
    * Crash anywhere: either the old pointer still serves, or the
    * committed next is promoted by the next read. */
  def publish(spark: SparkSession, root: String, gen: String): Unit = {
    require(gen.matches("gen\\d+"), s"bad generation name: $gen")
    val f = fs(spark, root)
    require(f.exists(new Path(s"$root/$gen")),
      s"publish: generation dir $root/$gen does not exist")
    val prev = live(spark, root) // also recovers a stranded swap
    val next = new Path(s"$root/$NextName")
    val out = f.create(next, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    recover(f, root) // promote: the atomic pointer flip
    val keep = Set(gen) ++ prev
    f.listStatus(new Path(root)).foreach { st =>
      val nm = st.getPath.getName
      if (st.isDirectory && nm.matches("gen\\d+") && !keep.contains(nm))
        f.delete(st.getPath, true)
    }
  }
}
