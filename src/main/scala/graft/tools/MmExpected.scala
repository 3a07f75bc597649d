package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the committed mm-decode EXPECTED parquet fixtures that
  * back the `mm_image_decode` / `mm_video_decode` fixture-checksum
  * oracles (`fixtures/mm_*_expected.parquet`). Both queries are
  * deterministic pure-JVM functions of doc_id alone (synthetic
  * PNG/GIF payloads → real javax.imageio decode → luminance strips),
  * so the expected output is a committed artifact the DuckDB oracle
  * reads back — any behavior drift in the codec path reads as a red
  * hash row. Run this ONLY when the decode semantics change on
  * purpose: `runMain graft.tools.MmExpected [sfDir] [outDir]`.
  */
object MmExpected {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("fixtures")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // mm_image/video_decode are pure functions of doc_id (synthetic
    // payloads); mm_frame_pipeline reads the documents TEXT, so its
    // fixture is pinned to the sf0.01 corpus — the driver's correctness
    // gate scale (the oracle compare never runs at another sf)
    for (q <- Seq("mm_image_decode", "mm_video_decode",
        "mm_frame_pipeline")) {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_mm_expected_").toString
      // one sorted file so the committed artifact is byte-stable
      // across regenerations (parquet row order is part of the file,
      // not the compare — compare_oracle hashes sorted rows)
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.orderBy(df.columns.map(org.apache.spark.sql.functions.col)
          .toIndexedSeq: _*)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(s"$outDir/${q}_expected.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"$q -> $outDir/${q}_expected.parquet")
    }
    spark.stop()
  }
}
