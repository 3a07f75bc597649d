package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diversity-aware top-k retrieval — the two standard shapes a
  * production retrieval/curation stack runs when plain top-k collapses
  * onto near-duplicates or one dominant source:
  *
  *  - **Capped diversification** ([[capDiversified]]): at most `m`
  *    results per group (label/source/cluster), then the global top-k
  *    of the survivors. Fully relational — two bounded ranking passes —
  *    and therefore exactly checkable in SQL.
  *  - **Maximal Marginal Relevance** ([[mmr]], Carbonell & Goldstein,
  *    SIGIR 1998): greedy re-rank of a bounded candidate list,
  *    `next = argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` — the
  *    redundancy-penalizing selection RAG pipelines run on the ANN
  *    arm's output.
  *
  * Scale shape: cap diversification's stage 1 is a bounded-heap
  * aggregate per (query, group) — map-side combinable, never a global
  * sort; stage 2 ranks the ≤ groups·m survivors per query. MMR runs
  * entirely on bounded per-query candidate lists (the ANN stage bounds
  * them): the pairwise-sim fan-out is `nCand²` rows per query, grouped
  * and greedily reduced per query IN THE EXECUTORS (`mapGroups`), so
  * the driver never materializes candidates and queries parallelize
  * across the cluster.
  *
  * Determinism: every score is 9-decimal-quantized before any ranking
  * or arithmetic (the repo-wide oracle discipline), MMR's objective is
  * a fixed two-term expression on those quantized inputs, and all ties
  * break on the smaller id. */
object DiverseTopK {

  /** Per-group cap + global re-rank. `scored` must carry
    * `(q_id, group, d_id, score)` with `score` already quantized; at
    * most `m` rows per (q_id, group) survive (score desc, d_id asc),
    * and the per-query top-`k` of the survivors is returned as
    * `(q_id, rank, d_id, group, score)`. */
  def capDiversified(scored: DataFrame, m: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val capped = TopK.perGroupAgg(scored,
      Seq(col("q_id"), col("group")), col("score"), col("d_id"), m,
      rankCol = "lrank", idName = "d_id")
    // survivors per query are bounded by (#groups × m): the window
    // shuffles only that bounded set, keyed by q_id
    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("d_id").asc)
    capped.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("d_id"), col("group"),
        col("score"))
  }

  /** MMR greedy re-rank of bounded candidate lists.
    *
    * `cands`: `(q_id, d_id, rel)` — the per-query candidate lists with
    * 9-quantized relevance (an ANN/kNN stage's output, ≤ nCand rows per
    * query). `vecs`: `(d_id, d_vec)` — the candidates' vectors (joined
    * once; only candidate rows are read). Returns
    * `(q_id, rank, d_id, mmr_score, rel)` with `rank ≤ k` in greedy
    * selection order.
    *
    * The candidate-pair cosine fan-out and the greedy loop both key by
    * `q_id`: pair rows build in the executors from a per-query
    * self-join of the bounded lists, and `mapGroups` reduces each
    * query's ≤ nCand² pairs to its k selections independently —
    * per-query work is O(nCand·k) with an O(nCand²) sim map, nothing
    * is driver-resident. */
  def mmr(spark: SparkSession, cands: DataFrame, vecs: DataFrame,
          k: Int, lambda: Double = 0.5): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions.vecCosine
    // LEFT join + loud null check: an inner join would silently drop a
    // candidate's pair rows when its vector is missing from `vecs`,
    // leaving it selectable (via its rel row) but never penalized —
    // a skewed greedy objective instead of a failure
    val withVec = cands.select(col("q_id"), col("d_id"), col("rel"))
      .join(vecs.select(col("d_id"), col("d_vec")), Seq("d_id"),
        "left_outer")
      .select(col("q_id"), col("d_id"),
        when(col("d_vec").isNull, raise_error(concat(
          lit("mmr: candidate d_id="), col("d_id").cast("string"),
          lit(" has no vector in vecs"))))
          .otherwise(col("d_vec")).as("d_vec"))
    val a = withVec.select(col("q_id"), col("d_id").as("a_id"),
      col("d_vec").as("a_vec"))
    val b = withVec.select(col("q_id"), col("d_id").as("b_id"),
      col("d_vec").as("b_vec"))
    val pairs = a.join(b, Seq("q_id"))
      .filter(col("a_id") < col("b_id"))
      .select(col("q_id"), col("a_id"), col("b_id"),
        round(vecCosine(col("a_vec"), col("b_vec")), 9).as("sim"),
        lit(false).as("is_rel"))
    // rel rows ride along under an explicit row-type flag (NOT an id
    // sentinel — a corpus with a legitimate d_id equal to any sentinel
    // value must not collide with the relevance channel)
    val relRows = cands.select(col("q_id"), col("d_id").as("a_id"),
      lit(0L).as("b_id"), col("rel").cast("double").as("sim"),
      lit(true).as("is_rel"))
    relRows.unionAll(pairs)
      .as[(Long, Long, Long, Double, Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val rel = scala.collection.mutable.LongMap.empty[Double]
        val sim = scala.collection.mutable.HashMap
          .empty[(Long, Long), Double]
        it.foreach { case (_, aId, bId, s, isRel) =>
          if (isRel) rel(aId) = s
          else sim((aId, bId)) = s
        }
        def simOf(x: Long, y: Long): Double =
          if (x == y) 1.0
          else sim.getOrElse(if (x < y) (x, y) else (y, x), 0.0)
        val remaining = scala.collection.mutable.TreeSet.empty[Long]
        rel.keysIterator.foreach(remaining += _)
        val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Double, Double)]
        var rank = 0L
        while (rank < k && remaining.nonEmpty) {
          var bestId = -1L
          var bestVal = Double.NegativeInfinity
          // TreeSet iteration is id-ascending, so strict > keeps the
          // SMALLEST id on ties — deterministic
          remaining.foreach { d =>
            val maxSim =
              if (selected.isEmpty) 0.0
              else selected.iterator.map(s => simOf(d, s)).max
            val v = lambda * rel(d) - (1.0 - lambda) * maxSim
            if (v > bestVal) { bestVal = v; bestId = d }
          }
          rank += 1
          selected += bestId
          remaining -= bestId
          out += ((qid, rank, bestId,
            math.rint(bestVal * 1e6) / 1e6,
            math.rint(rel(bestId) * 1e6) / 1e6))
        }
        out.iterator
      }
      .toDF("q_id", "rank", "d_id", "mmr_score", "rel")
  }
}
