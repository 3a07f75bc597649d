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

  private val cache =
    new scala.collection.concurrent.TrieMap[(String, (Long, Long, Long)), Long]

  /** Total rows across every `.parquet` file under `path` (recursive,
    * so cell-partitioned layouts count whole). 0 for a missing dir. */
  def rowsCached(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return 0L
    val files = {
      val it = fs.listFiles(root, true)
      val b = scala.collection.mutable.ArrayBuffer.empty[
        org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) b += st
      }
      b
    }
    val sig = (files.size.toLong, files.map(_.getLen).sum,
      if (files.isEmpty) 0L else files.map(_.getModificationTime).max)
    cache.getOrElseUpdate((path, sig), {
      var n = 0L
      files.foreach { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try n += r.getRecordCount finally r.close()
      }
      n
    })
  }
}
