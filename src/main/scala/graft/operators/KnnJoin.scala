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
  * whole-stage codegen — then per-query top-k via the bounded-heap
  * [[graft.functions.TopKAggregator]]: map-side partial aggregation keeps
  * ≤ k rows per query per partition, so the only shuffle carries
  * O(queries · k) rows. Norms are materialized ONCE per side before the
  * join (the reference normalizes at load, `index_bipartite.cpp:37-39`),
  * so the per-pair kernel is a single dot product — the `dot/(‖q‖·‖d‖)`
  * division keeps the arithmetic bit-identical to the DuckDB oracle SQL.
  *
  * The data side streams; nothing materializes O(N_q × N_d). At 100 TB
  * this is the ground-truth/oracle job (SURVEY M1) — online queries should
  * go through the RoarGraph index (graft.index) instead.
  */
object KnnJoin {

  /** Exact top-k by metric ("cosine" | "dot" | "l2") from `queries`
    * (`q_id`, `q_vec`) to `data` (`d_id`, `d_vec`).
    * Output: (q_id, rank, d_id, score) — score is similarity
    * (higher = better; l2 is negated squared distance) quantized to 9
    * decimals so ranks are float-noise-stable, tie-broken by d_id
    * ascending for determinism. */
  def bruteForce(queries: DataFrame, data: DataFrame, k: Int,
                 metric: String = "cosine",
                 excludeSelf: Boolean = false): DataFrame = {
    val needNorms = metric == "cosine"
    val q = if (needNorms) queries.withColumn("q_norm", vecNorm(col("q_vec")))
            else queries
    val d = if (needNorms) data.withColumn("d_norm", vecNorm(col("d_vec")))
            else data
    // Broadcast the query side: the big data side streams partition-local.
    val joined = d.crossJoin(broadcast(q))
    val qv = col("q_vec"); val dv = col("d_vec")
    val score = metric match {
      case "cosine" => vecDot(qv, dv) / (col("q_norm") * col("d_norm"))
      case "dot"    => vecDot(qv, dv)
      case "l2"     => -vecL2Sq(qv, dv)
      case m        => throw new IllegalArgumentException(s"metric $m")
    }
    val scored0 = joined.withColumn("score", round(score, 9))
    val scored =
      if (excludeSelf) scored0.filter(col("q_id") =!= col("d_id")) else scored0
    TopK.perGroupAgg(scored, Seq(col("q_id")),
      col("score"), col("d_id"), k, idName = "d_id")
      .select(col("q_id"), col("rank"), col("d_id"), col("score"))
  }
}
