package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * before/after plan evidence for optimization rounds
  * (`plans/r<N>/<query>_<suffix>.txt`). Lifecycle queries mutate a temp
  * index while building their result; the captured plan is the plan of
  * the RETURNED DataFrame (the serving plan), which is what the round's
  * plan claims are about.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> q1,q2,...
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qlist) = args.take(4)
    val names = qlist.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        System.err.println(s"[explain] $name -> $outDir/${name}_$suffix.txt")
      } catch { case t: Throwable =>
        System.err.println(s"[explain] $name FAILED: ${t.getMessage}")
      }
      graft.Bench.dropLeakedBlocks(spark)
    }
    spark.stop()
  }
}
