package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator

/** Per-group top-k — the reference's `std::partial_sort` short-circuit
  * (`/root/reference/src/multivector_reranker.cpp:85-97,145-157,217-229`).
  *
  * Global top-k should just be `df.orderBy(...).limit(k)` — Catalyst plans
  * `TakeOrderedAndProject` (no full sort). For per-group top-k:
  *
  *  - [[perGroup]] — rank-window form. This is the DuckDB-checkable
  *    relational SPEC; it shuffles and fully sorts every group's rows
  *    (windows have no map-side partial aggregation), so it is NOT the
  *    scale path.
  *  - [[perGroupAgg]] — bounded-heap [[graft.functions.TopKAggregator]]:
  *    map-side partial aggregation keeps ≤ k rows per group per partition,
  *    the shuffle carries O(groups·k) rows, and the plan is
  *    ObjectHashAggregate. Use this on every hot path.
  */
object TopK {

  /** Rank-window spec: top `k` rows per `groupCols` by `orderCols` (pass
    * fully deterministic order incl. tie-breaks), with a 1-based `rank`. */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
               k: Int, rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Bounded-heap form: top `k` (scoreCol desc, idCol asc) per group.
    * Output columns: groupCols ++ (rank, idCol-name, scoreCol-name).
    * Quantize `scoreCol` before calling if ranks must be oracle-stable. */
  def perGroupAgg(df: DataFrame, groupCols: Seq[Column],
                  scoreCol: Column, idCol: Column, k: Int,
                  rankCol: String = "rank", idName: String = "id",
                  scoreName: String = "score"): DataFrame = {
    val topk = TopKAggregator.column(k)
    df.groupBy(groupCols: _*)
      .agg(topk(scoreCol, idCol).as("_topk"))
      .select(groupCols :+ posexplode(col("_topk")): _*)
      .select(groupCols ++ Seq(
        (col("pos") + 1).as(rankCol),
        col("col.id").as(idName),
        col("col.score").as(scoreName)): _*)
  }
}
