package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    VectorQueries,
    IndexQueries,
    EvalQueries,
    TextQueries,
    AnnQueries,
    VarcQueries,
    EventQueries
  )

  /** Flagship query on /root/testdata/sf0.001: RoarGraph multivector
    * adaptive beam search + smooth-Chamfer rerank top-k — the reference's
    * `test_search_multivector_rerank` path, index-backed end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    IndexQueries.queries("g9_multivector_search")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
