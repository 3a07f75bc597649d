package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-to-set similarity scoring — the reference's rerank metrics:
  *
  *  - summed-max similarity (ColBERT MaxSim):
  *    `ComputeSummedMaxSimilarity` —
  *    `/root/reference/src/multivector_reranker.cpp:432-438`:
  *    Σ_i max_j sim(q_i, d_j) over the query set's rows i.
  *
  *  - smooth-Chamfer (DiVE):
  *    `computeSmoothChamferDistance` —
  *    `/root/reference/src/multivector_reranker.cpp:330-375`, constants
  *    `include/multivector_reranker.h:117-120` (τ=16, txt_scale s=1,
  *    denominator=2; BOTH terms divide by the fixed query-set cardinality
  *    `multi_vector_cardinality`, not by each side's own size):
  *
  *      term1 = Σ_i LSE_j(τ·s·sim_ij) / (c·τ·s)
  *      term2 = Σ_j LSE_i(τ·sim_ij)   / (c·τ)
  *      SCD   = (term1 + term2) / denom
  *
  *    with the max-subtraction-stable LSE(x) = max + log Σ exp(x − max)
  *    exactly as the reference computes it (rowwise/colwise maxCoeff then
  *    exp/sum/log — `multivector_reranker.cpp:341-371`).
  *
  * Input is the "sim triple" DataFrame (qset_id, dset_id, q_sub, d_sub,
  * sim) produced by joining query-set rows × candidate-set rows; both
  * operators are pure relational aggregations over it, so Catalyst gets
  * partial aggregation / whole-stage codegen, and DuckDB can run the same
  * SQL as an oracle. The LSE max is attached with a window over the same
  * partition keys as the following groupBy — at scale the window sort and
  * the aggregation share one shuffle of the sim triples.
  */
object SetSim {
  val Temperature = 16.0
  val TxtScale = 1.0
  val Denominator = 2.0

  /** A3 (set half) — name→scorer dispatch, the reference's
    * `SetDistanceMetric` map (`multivector_reranker.cpp:440-503`:
    * `smooth_chamfer` / `summed_max_similarity`; the vector half lives in
    * `graft.index.Metrics`). Scorers take (simTriples, queryCardinality). */
  val registry: Map[String, (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame] =
    Map(
      "smooth_chamfer" -> ((sims, cQ) => smoothChamferAgg(sims, cQ)),
      "summed_max_similarity" -> ((sims, _) => maxSimAgg(sims)))

  def apply(name: String): (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"unknown set metric '$name' (have: ${registry.keys.mkString(", ")})"))

  /** MaxSim spec: groupBy (qset,dset,q_sub) max → groupBy (qset,dset) sum.
    * Two shuffles; kept as the DuckDB-checkable relational form. */
  def maxSim(sims: DataFrame): DataFrame =
    sims.groupBy("qset_id", "dset_id", "q_sub")
      .agg(max("sim").as("max_sim"))
      .groupBy("qset_id", "dset_id")
      .agg(sum("max_sim").as("score"))

  /** MaxSim scale path: ONE shuffle via [[graft.functions.MaxSimAggregator]]
    * (buffer = per-i running max, map-side combine). */
  def maxSimAgg(sims: DataFrame): DataFrame = {
    val agg = graft.functions.MaxSimAggregator.column
    sims.groupBy("qset_id", "dset_id")
      .agg(agg(col("q_sub"), col("sim")).as("score"))
  }

  /** Smooth-Chamfer scale path: ONE shuffle via
    * [[graft.functions.ChamferAggregator]] (buffer = the ≤ c_q·c_d sim
    * cells of one set pair; exact two-pass LSE at finish). `cQ` is the
    * QUERY-side cardinality — the denominator even when the data side's
    * cardinality varies (`multivector_reranker.cpp:377-430`). */
  def smoothChamferAgg(sims: DataFrame, cQ: Int,
                       temperature: Double = Temperature,
                       txtScale: Double = TxtScale,
                       denominator: Double = Denominator): DataFrame = {
    val agg = graft.functions.ChamferAggregator.column(
      cQ, temperature, txtScale, denominator)
    sims.groupBy("qset_id", "dset_id")
      .agg(agg(col("q_sub"), col("d_sub"), col("sim")).as("score"))
  }

  /** Smooth-Chamfer with fixed query cardinality `c`. */
  def smoothChamfer(sims: DataFrame, c: Int,
                    temperature: Double = Temperature,
                    txtScale: Double = TxtScale,
                    denominator: Double = Denominator): DataFrame = {
    val t1 = lit(temperature * txtScale)
    val t2 = lit(temperature)

    // LSE over j for each (qset, dset, i): stable max-subtraction form.
    val wRow = Window.partitionBy("qset_id", "dset_id", "q_sub")
    val wCol = Window.partitionBy("qset_id", "dset_id", "d_sub")
    def lse(scaled: Column, w: org.apache.spark.sql.expressions.WindowSpec,
            groupKey: String, outName: String): DataFrame = {
      sims
        .withColumn("x", scaled)
        .withColumn("m", max(col("x")).over(w))
        .groupBy(col("qset_id"), col("dset_id"), col(groupKey))
        .agg((first("m") + log(sum(exp(col("x") - col("m"))))).as(outName))
    }
    val rowLse = lse(col("sim") * t1, wRow, "q_sub", "row_lse")
      .groupBy("qset_id", "dset_id")
      .agg(sum("row_lse").as("term1_sum"))
    val colLse = lse(col("sim") * t2, wCol, "d_sub", "col_lse")
      .groupBy("qset_id", "dset_id")
      .agg(sum("col_lse").as("term2_sum"))

    rowLse.join(colLse, Seq("qset_id", "dset_id"))
      .select(col("qset_id"), col("dset_id"),
        ((col("term1_sum") / lit(c.toDouble * temperature * txtScale) +
          col("term2_sum") / lit(c.toDouble * temperature)) /
          lit(denominator)).as("score"))
  }
}
