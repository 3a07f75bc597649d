package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The operator-face twin of the routed plans' `RelationQueryGuard`
  * ([[graft.plans]]): the ANN operator entry points ([[IvfPq
  * .knnOverIndex]], [[Sq8Ann.searchEncoded]]) collect their query
  * batch driver-side to resolve probes / broadcast the query block —
  * bounded BY DESIGN (the blocked drivers slice to ≤ blockSize ids;
  * the routed SQL path caps the query relation), but "bounded" must be
  * enforced at the entry point too: a caller handing an unbounded
  * query DataFrame straight to the direct API would otherwise OOM the
  * driver inside collect. `spark.graft.ann.operator.maxQueries`
  * (default 100000, matching the relation route's cap) fails the call
  * loudly instead; `take(cap+1)` (executeTake — incremental partition
  * reads, no extra limit exchange in the plan) stops the job from
  * materializing the overflow. */
object QueryBatchGuard {

  /** Collect `(q_id, q_vec)` rows, failing loudly past the cap. */
  def collectBounded(queries: DataFrame): Array[(Long, Array[Float])] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cap = spark.conf
      .get("spark.graft.ann.operator.maxQueries", "100000").toInt
    val rows = queries.select(col("q_id"), col("q_vec"))
      .as[(Long, Array[Float])].take(cap + 1)
    require(rows.length <= cap,
      s"query batch exceeds spark.graft.ann.operator.maxQueries=$cap — " +
        "the direct operator API collects the query side; use the " +
        "blocked driver (knnOverIndexBlocked / searchEncodedBlocked) " +
        "or raise the cap")
    rows
  }
}
