package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k — the reference's `std::partial_sort` short-circuit
  * (`/root/reference/src/multivector_reranker.cpp:85-97,145-157,217-229`).
  *
  * Global top-k should just be `df.orderBy(...).limit(k)` — Catalyst plans
  * `TakeOrderedAndProject` (no full sort). Per-group top-k uses a
  * rank-window here; for very hot per-group paths at scale prefer
  * [[graft.functions.TopKAggregator]] (bounded heap, map-side partial
  * aggregation — a window sorts whole partitions).
  */
object TopK {

  /** Keep the top `k` rows per `groupCols`, ordered by `orderCols`
    * (pass fully deterministic order incl. tie-breaks), adding a 1-based
    * `rank` column. */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
               k: Int, rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
