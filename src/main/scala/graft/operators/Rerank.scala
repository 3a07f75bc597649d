package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** The relational rerank tail shared by every index-backed search path
  * (`Rerank`, `/root/reference/src/multivector_reranker.cpp:38-98`):
  * P9 candidate→set dedup, J2 member gather, A1 smooth-Chamfer scoring
  * (single-shuffle aggregator), W1 bounded-heap top-k with
  * oracle-stable quantized ranking. */
object Rerank {

  /** @param emb        corpus (vec_id, embedding), fixed cardinality `c`
    * @param querySets  (qset_id, q_sub, q_vec)
    * @param cands      candidate vectors (qset_id, d_id) — pre-dedup ok
    * @param cQ         chamfer denominator (query cardinality); defaults
    *                   to the number of subqueries `c` */
  def chamferTopK(emb: DataFrame, querySets: DataFrame, cands: DataFrame,
                  c: Int, k: Int, cQ: Int = -1): DataFrame = {
    val denom = if (cQ > 0) cQ else c
    val candSets = cands.select(col("qset_id"),
      (col("d_id") / c).cast("long").as("dset_id")).distinct()
    val members = emb.select(
      (col("vec_id") / c).cast("long").as("dset_id"),
      (col("vec_id") % c).cast("int").as("d_sub"),
      col("embedding").as("d_vec"))
      .withColumn("d_norm", vecNorm(col("d_vec")))
    val qv = querySets.withColumn("q_norm", vecNorm(col("q_vec")))
    val triples = candSets
      .join(members, Seq("dset_id"))
      .join(broadcast(qv), Seq("qset_id"))
      .select(col("qset_id"), col("dset_id"), col("q_sub"), col("d_sub"),
        (vecDot(col("q_vec"), col("d_vec")) /
          (col("q_norm") * col("d_norm"))).as("sim"))
    val scored = SetSim.smoothChamferAgg(triples, denom)
      .withColumn("score", round(col("score"), 9))
    TopK.perGroupAgg(scored, Seq(col("qset_id")),
        col("score"), col("dset_id"), k, idName = "dset_id")
      .select(col("qset_id"), col("rank"), col("dset_id"),
        round(col("score"), 6).as("score"))
  }

  /** Variable-cardinality-QUERY twin of [[chamferTopK]]: query sets are
    * RAGGED (each qset_id brings its own number of q_sub rows — the S7
    * mapping surface end-to-end, `multivector_reranker.cpp:767-809`
    * feeding `:377-430`), and the chamfer denominator is each set's OWN
    * cardinality. Both chamfer terms scale linearly in 1/c_q, so the
    * per-set denominator rides the UNCHANGED single-shuffle aggregator
    * (run at cQ=1) with one broadcast join of the output-sized per-set
    * cardinality table — no new shuffle, same 100 TB shape as the
    * fixed-c path. Data side stays the fixed-`c` corpus grid. */
  def chamferTopKVarc(emb: DataFrame, querySets: DataFrame,
                      cands: DataFrame, c: Int, k: Int): DataFrame = {
    val candSets = cands.select(col("qset_id"),
      (col("d_id") / c).cast("long").as("dset_id")).distinct()
    val members = emb.select(
      (col("vec_id") / c).cast("long").as("dset_id"),
      (col("vec_id") % c).cast("int").as("d_sub"),
      col("embedding").as("d_vec"))
      .withColumn("d_norm", vecNorm(col("d_vec")))
    val qv = querySets.withColumn("q_norm", vecNorm(col("q_vec")))
    val triples = candSets
      .join(members, Seq("dset_id"))
      .join(broadcast(qv), Seq("qset_id"))
      .select(col("qset_id"), col("dset_id"), col("q_sub"), col("d_sub"),
        (vecDot(col("q_vec"), col("d_vec")) /
          (col("q_norm") * col("d_norm"))).as("sim"))
    val cardQ = querySets.groupBy("qset_id")
      .agg(countDistinct(col("q_sub")).cast("double").as("c_q"))
    val scored = SetSim.smoothChamferAgg(triples, 1)
      .join(broadcast(cardQ), Seq("qset_id"))
      .withColumn("score", round(col("score") / col("c_q"), 9))
    TopK.perGroupAgg(scored, Seq(col("qset_id")),
        col("score"), col("dset_id"), k, idName = "dset_id")
      .select(col("qset_id"), col("rank"), col("dset_id"),
        round(col("score"), 6).as("score"))
  }
}
