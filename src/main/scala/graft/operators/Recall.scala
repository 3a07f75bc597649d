package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation joins — the reference's `RecallCalculator`
  * (`/root/reference/src/multivector_reranker.cpp:610-669`).
  */
object Recall {

  /** Recall@k of `results` (query_id, ids array<long>, best-first) against
    * `gt` (query_id, gt_ids array<long>): |top-k ∩ gt-top-k| / k.
    * `ComputeRecall` (`multivector_reranker.cpp:610-643`) — hash-set
    * membership becomes `array_intersect`. */
  def atK(results: DataFrame, gt: DataFrame, k: Int): DataFrame =
    results.join(gt, "query_id")
      .select(col("query_id"), atKCol(col("ids"), col("gt_ids"), k).as("recall"))

  /** Column form of [[atK]] for when results and GT already share a row
    * (e.g. both rankings computed in one aggregation) — same semantics,
    * no join. */
  def atKCol(ids: Column, gtIds: Column, k: Int): Column =
    size(array_intersect(slice(ids, 1, k), slice(gtIds, 1, k)))
      .cast("double") / k

  /** Paired recall: hit iff any of the top-k ids falls in the query's
    * paired id range [start, start+count) — `ComputePairedRecall`
    * (`multivector_reranker.cpp:645-669`), a range join in Spark. */
  def paired(results: DataFrame, pairs: DataFrame, k: Int): DataFrame =
    results.join(pairs, "query_id")
      .select(col("query_id"),
        (exists(slice(col("ids"), 1, k),
          id => id >= col("paired_start") &&
            id < col("paired_start") + col("paired_count"))
          .cast("int")).as("hit"))
}
