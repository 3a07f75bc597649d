package graft.index

import org.apache.spark.sql.SparkSession

/** Parquet-footer row counts off a recursive file listing — no data
  * read and no Spark job. This is how a REGISTERED serving tier
  * observes post-registration index growth cheaply enough to do it per
  * query: one directory walk (and zero footer reads while the listing
  * signature — file count, total bytes, max mtime — is unchanged; any
  * append changes it and invalidates the cached count).
  *
  * Shared by the growth-aware registrations
  * ([[graft.plans.AnnIndexRegistry.registerIvfPq]] via
  * `IvfPq.indexRows`, [[graft.plans.AnnIndexRegistry.registerSq8]]);
  * [[ShardedIndex]] keeps its own per-shard variant keyed by the
  * discovered shard/delta counts.
  */
object ParquetMeta {

  // one entry PER PATH (signature + count) — an append supersedes the
  // previous signature in place, so a serving JVM with ongoing
  // delta-ingest stays bounded at one cached count per index path
  private val cache =
    new scala.collection.concurrent.TrieMap[String, ((Long, Long, Long), Long)]

  /** True when any path component below `root` is a work/metadata name
    * (`_temporary`, `_SUCCESS`, `.hidden`, Hadoop `.crc` twins) — the
    * same visibility rule Spark's own file index applies. An in-flight
    * or aborted append MUST be invisible here: a half-written part
    * file has no footer (the open would throw), and a complete but
    * uncommitted task file is not part of the corpus. */
  private def isHidden(root: org.apache.hadoop.fs.Path,
                       p: org.apache.hadoop.fs.Path): Boolean = {
    var cur = p
    while (cur != null && cur != root) {
      val n = cur.getName
      if (n.startsWith("_") || n.startsWith(".")) return true
      cur = cur.getParent
    }
    false
  }

  /** Total rows across every COMMITTED `.parquet` file under `path`
    * (recursive, so cell-partitioned layouts count whole; hidden/work
    * directories skipped). 0 for a missing dir. */
  def rowsCached(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val raw = new org.apache.hadoop.fs.Path(path)
    val fs = raw.getFileSystem(conf)
    if (!fs.exists(raw)) return 0L
    // listFiles returns fully-qualified paths; qualify the root so the
    // hidden-ancestor walk terminates AT the index root (a hidden-named
    // ancestor of the root itself must not blank the listing)
    val root = fs.makeQualified(raw)
    val files = {
      val it = fs.listFiles(root, true)
      val b = scala.collection.mutable.ArrayBuffer.empty[
        org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
            !isHidden(root, st.getPath)) b += st
      }
      b
    }
    val sig = (files.size.toLong, files.map(_.getLen).sum,
      if (files.isEmpty) 0L else files.map(_.getModificationTime).max)
    cache.get(path) match {
      case Some((s, n)) if s == sig => n
      case _ =>
        var n = 0L
        files.foreach { st =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try n += r.getRecordCount finally r.close()
        }
        evictSupersededGens(cache, path)
        cache.put(path, (sig, n))
        n
    }
  }

  /** Evict entries for SUPERSEDED generations of `liveDir`'s root from
    * a generation-dir-keyed cache: keys whose remainder after the root
    * prefix is exactly one `gen<digits>` segment, other than the live
    * one. Bounds long-lived maintenance JVMs that poll across many
    * generation flips (one entry per retired dir otherwise accumulates
    * for the process lifetime) WITHOUT touching a distinct root nested
    * under the same prefix (`/data/idx/sub/gen0` is not evicted by
    * `/data/idx/gen1` — the remainder `sub/gen0` is not one segment).
    * No-op when `liveDir` is not itself a generation dir. */
  private[graft] def evictSupersededGens[V](
      cache: scala.collection.concurrent.TrieMap[String, V],
      liveDir: String): Unit = {
    val cut = liveDir.lastIndexOf('/')
    if (cut <= 0 || !liveDir.substring(cut + 1).matches("gen\\d+")) return
    val prefix = liveDir.substring(0, cut + 1)
    cache.keysIterator.filter { k =>
      k != liveDir && k.startsWith(prefix) &&
        k.substring(prefix.length).matches("gen\\d+")
    }.foreach(cache.remove)
  }
}
