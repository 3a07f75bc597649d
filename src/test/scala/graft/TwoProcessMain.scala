package graft

/** Mini-driver for [[ForkedJvmSpec]] — a SECOND JVM (own process, own
  * SparkSession, own manifest/resolution caches) acting against the
  * same generation root as the test JVM. The in-JVM race specs pin the
  * interleavings; this pins the actual cross-PROCESS claims: the
  * seqlog conditional put is a true CAS between processes, the writer
  * lease excludes a second process loudly, and a reader lease taken by
  * one process pins its generation against another process's
  * publishes.
  *
  * Protocol: plain files in the scratch dir (`go`/`release` inputs
  * polled; results written atomically via tmp+rename so the parent
  * never reads a partial file). */
object TwoProcessMain {

  private def waitFor(p: String, ms: Long = 180000): Unit = {
    val t0 = System.currentTimeMillis()
    while (!java.nio.file.Files.exists(java.nio.file.Paths.get(p))) {
      if (System.currentTimeMillis() - t0 > ms)
        sys.error(s"TwoProcessMain: timeout waiting for $p")
      Thread.sleep(20)
    }
  }

  private def write(p: String, s: String): Unit = {
    val tmp = java.nio.file.Paths.get(p + ".tmp")
    java.nio.file.Files.write(tmp, s.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(p),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-two-process-$mode")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try mode match {
      // cas <root> <slot> <goFile> <resultFile>: wait for go, then
      // claim the FIXED log slot — two processes race the same slot,
      // exactly one conditional put can win
      case "cas" =>
        val Array(_, root, slot, go, result) = args
        val f = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        waitFor(go)
        try {
          graft.index.Generations.commitSeqlogAt(spark, f, root,
            slot.toLong, Seq("gen0"))
          write(result, "win")
        } catch {
          case e: IllegalStateException
              if e.getMessage.contains("lost the race") =>
            write(result, "lost")
        }
      // writer <root> <resultFile>: one attempt to take the writer
      // lease; reports acquired or blocked:<holder message>
      case "writer" =>
        val Array(_, root, result) = args
        try graft.index.Generations.withWriterLease(spark, root,
          "childWriter") { write(result, "acquired") }
        catch {
          case e: IllegalStateException =>
            write(result, "blocked:" + e.getMessage.replace('\n', ' '))
        }
      // readerlease <root> <leasedFile> <releaseFile>: pin the live
      // generation, report it, hold the lease until told to release
      case "readerlease" =>
        val Array(_, root, leased, release) = args
        graft.index.Generations.withReaderLease(spark, root) { dir =>
          write(leased, dir)
          waitFor(release)
        }
        write(release + ".done", "ok")
      case other => sys.error(s"TwoProcessMain: unknown mode $other")
    } finally spark.stop()
  }
}
