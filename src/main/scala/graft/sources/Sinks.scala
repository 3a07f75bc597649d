package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation sinks — S12 TSV eval stream
  * (`tests/test_search_multivector_rerank.cpp:322-347`: per-query rows +
  * one aggregate line) and S13 set-GT writer
  * (`RerankAllAndGenerateSetGroundTruth`,
  * `/root/reference/src/multivector_reranker.cpp:160-181`).
  */
object Sinks {

  /** S12: tab-separated eval rows (header on, one dir of part files). */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(path)

  /** S12 aggregate line: (avg recall, QPS = n/Σt, rerank-time fraction). */
  def evalAggregate(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      round(avg("recall"), 6).as("avg_recall"),
      round(count(lit(1)) / sum("total_sec"), 6).as("qps"),
      round(sum("rerank_sec") / sum("total_sec"), 6).as("rerank_frac"))

  /** S13: set-level ground truth from a (query_id, rank, id) ranking —
    * parquet (query_id, gt_ids best-first) + optional binary ibin parity. */
  def writeSetGt(ranked: DataFrame, path: String,
                 ibinPath: Option[String] = None): Unit = {
    val gt = ranked
      .groupBy(col("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("rank"), col("id")))),
        x => x.getField("id")).as("gt_ids"))
    gt.write.mode("overwrite").parquet(path)
    ibinPath.foreach { p =>
      Fbin.writeIbin(
        gt.select(col("query_id").as("row_id"), col("gt_ids").as("ids")), p)
    }
  }

  /** Load S13 output back as (query_id, gt_ids). */
  def readSetGt(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
