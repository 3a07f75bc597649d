package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Brute-force k-NN join — the reference's exhaustive-scan oracle
  * `RankAllVectorsBySequentialScan`
  * (`/root/reference/src/multivector_reranker.cpp:183-230`: per-chunk GEMM
  * then per-query top-k partial sort).
  *
  * Spark shape: broadcast the (small) query side against the (huge) data
  * side — a broadcast-nested-loop join whose score expression stays in
  * whole-stage codegen — then per-query top-k. The data side streams; no
  * O(N_q × N_d) materialization beyond the top-k aggregation state.
  * At 100 TB the data side is partition-parallel and the only shuffle is
  * the final per-query top-k combine (k rows per query per partition after
  * partial aggregation via the rank window's sort — or TopKAggregator).
  */
object KnnJoin {

  /** Exact top-k by metric ("cosine" | "dot" | "l2") from `queries`
    * (`q_id`, `q_vec`) to `data` (`d_id`, `d_vec`).
    * Output: (q_id, rank, d_id, score) — score is similarity
    * (higher = better; l2 is negated squared distance), tie-broken by
    * d_id ascending for determinism. */
  def bruteForce(queries: DataFrame, data: DataFrame, k: Int,
                 metric: String = "cosine",
                 excludeSelf: Boolean = false): DataFrame = {
    // Broadcast the query side: the big data side streams partition-local.
    val joined = data.crossJoin(broadcast(queries))
    val qv = col("q_vec"); val dv = col("d_vec")
    val score = metric match {
      case "cosine" => vecCosine(qv, dv)
      case "dot"    => vecDot(qv, dv)
      case "l2"     => -vecL2Sq(qv, dv)
      case m        => throw new IllegalArgumentException(s"metric $m")
    }
    val scored0 = joined.withColumn("score", score)
    val scored =
      if (excludeSelf) scored0.filter(col("q_id") =!= col("d_id")) else scored0
    TopK.perGroup(scored, Seq(col("q_id")),
        Seq(col("score").desc, col("d_id").asc), k)
      .select(col("q_id"), col("rank"), col("d_id"), col("score"))
  }
}
