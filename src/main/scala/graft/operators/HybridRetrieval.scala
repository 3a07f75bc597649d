package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid (lexical + semantic) retrieval with rank/score fusion — the
  * two-arm production retrieval stack a training-data or RAG pipeline
  * runs over a document corpus: a BM25 arm and an embedding-cosine arm
  * produce bounded top-N lists independently, then a fusion step merges
  * them into one ranking. Two standard fusions are provided:
  *
  *  - Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  *    `score(d) = Σ_arms 1/(c + rank_arm(d))`, the scoreless rank-only
  *    fusion that is robust to incomparable arm score scales.
  *  - Weighted min-max fusion (fit-combMNZ lineage, Lee 1997): each
  *    arm's scores min-max-normalize onto [0,1] over its own top-N
  *    list, then a convex combination merges them.
  *
  * Scale shape: each arm is the BOUNDED output of a distributed
  * retrieval (BM25 = [[graft.queries.TextQueries.bm25]]'s broadcast-
  * join + bounded-heap top-k; semantic = a sparse-cosine scan or any
  * registered ANN tier) — fusion itself only ever touches 2·N ranked
  * rows, so it joins two k-row frames (both auto-broadcast) and is
  * O(N) no matter the corpus size. Nothing here re-reads the corpus.
  *
  * Determinism (the DuckDB-hash-green discipline): every sum that could
  * be order-dependent is integer-quantized before aggregation — the
  * sparse dot product multiplies MICRO-quantized (×1e6, long) vector
  * components into exact PICO (1e-12) units and sums LONGs, so the
  * per-doc total is exact in any accumulation order. The fusion
  * arithmetic is a fixed two-term expression per row (never a
  * data-dependent-width float sum), so it is bit-stable too.
  *
  * Reference scope: the reference engine is vector-only retrieval
  * (SURVEY §2); the hybrid stack is part of this library's
  * LLM-pipeline surface, composing the reference-side ANN machinery
  * with the text side.
  */
object HybridRetrieval {

  /** Feature-hashing text embedding (Weinberger et al. 2009) over a
    * long `(id, tok)` frame: each token md5-hashes to one of 32 signed
    * buckets (hex nibbles — engine-portable, no 64-bit hash), per-id
    * bucket sums L2-normalize. Output is the SPARSE long form
    * `(id, pos, val)` with only nonzero buckets, `val` rounded to 6
    * decimals (the cross-engine hash boundary). One explode + one
    * map-side-combinable groupBy on (id, pos); the norm is a per-id
    * window over ≤32 rows. */
  def hashEmbed(toks: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col("tok"))
    val nib1 = conv(substring(h, 1, 1), 16, 10).cast("int")
    val nib2 = conv(substring(h, 2, 1), 16, 10).cast("int")
    val contrib = toks.select(col(idCol),
      (nib1 * 2 + pmod(nib2, lit(2))).cast("long").as("pos"),
      when(pmod(shiftright(nib2, 1), lit(2)) === 1, 1.0)
        .otherwise(-1.0).as("c"))
    val sums = contrib.groupBy(col(idCol), col("pos"))
      .agg(sum("c").as("v"))
    val nz = sums.filter(col("v") =!= 0.0)
    val w = Window.partitionBy(idCol)
    nz.withColumn("norm", sqrt(sum(col("v") * col("v")).over(w)))
      .select(col(idCol), col("pos"),
        round(round(col("v") / col("norm"), 9), 6).as("val"))
  }

  /** Top-k docs by sparse cosine against ONE query vector, both sides
    * in the `(id, pos, val)` hash-embedding form with L2-normalized,
    * 6-decimal values (so dot == cosine). The query side is tiny (≤32
    * rows) and broadcasts; products are exact pico-unit longs (micro ×
    * micro), summed as longs — order-independent — then rescaled to a
    * 6-decimal score. Returns `(rank, doc_id, score)` with the
    * score-desc id-asc tiebreak, via the bounded-heap aggregator
    * (never a global sort). */
  def sparseCosineTopK(docVecs: DataFrame, queryVec: DataFrame,
                       k: Int): DataFrame = {
    def micro(c: org.apache.spark.sql.Column) =
      round(c * lit(1e6), 0).cast("long")
    val dots = docVecs.join(
        broadcast(queryVec.select(col("pos"), col("val").as("qval"))),
        Seq("pos"))
      .select(col("doc_id"),
        (micro(col("val")) * micro(col("qval"))).as("pico"))
      .groupBy("doc_id").agg(sum("pico").as("pico"))
      .withColumn("score",
        round(col("pico").cast("double") / lit(1e12), 6))
    TopK.perGroupAgg(dots, Seq.empty, col("score"), col("doc_id"), k,
        idName = "doc_id")
      .select(col("rank").cast("long").as("rank"), col("doc_id"),
        col("score"))
  }

  /** Reciprocal Rank Fusion of two `(rank, doc_id, …)` lists:
    * `score = 1/(c + lex_rank) + 1/(c + sem_rank)` (absent arm
    * contributes 0, its reported rank is 0), re-ranked score-desc
    * id-asc, top `k`. Spark cannot broadcast a FULL OUTER join, so the
    * arm merge is a UNION + one hash aggregate instead (each doc
    * appears at most once per arm, so `max` recovers its per-arm rank
    * with 0 for absent) — no join, partial-agg friendly, and the only
    * exchange is over ≤2N ranked rows. */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k: Int,
              c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = lex.select(col("doc_id"), col("rank").as("lex_rank"),
        lit(0L).as("sem_rank"))
      .unionAll(sem.select(col("doc_id"), lit(0L).as("lex_rank"),
        col("rank").as("sem_rank")))
      .groupBy("doc_id")
      .agg(max("lex_rank").as("lex_rank"), max("sem_rank").as("sem_rank"))
    val fused = merged.withColumn("score", round(
      when(col("lex_rank") > 0, lit(1.0) / (lit(c) + col("lex_rank")))
        .otherwise(0.0) +
      when(col("sem_rank") > 0, lit(1.0) / (lit(c) + col("sem_rank")))
        .otherwise(0.0), 6))
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("score"),
        col("lex_rank"), col("sem_rank"))
  }

  /** Weighted min-max fusion: each arm's scores normalize onto [0,1]
    * over its own list (`(x - min)/(max - min)`; a constant list maps
    * to 1.0), absent docs contribute 0, and the fused score is the
    * convex combination `wLex·lex + (1-wLex)·sem`. Arm min/max are
    * order-independent aggregates over ≤N rows; the per-row arithmetic
    * is a fixed expression on already-6-decimal inputs. */
  def minMaxFuse(lex: DataFrame, sem: DataFrame, k: Int,
                 wLex: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def norm(df: DataFrame, out: String): DataFrame = {
      // min/max as a whole-frame WINDOW over the arm, not an aggregate
      // crossJoined back: the agg+crossJoin shape put the arm's full
      // scoring pipeline in the plan TWICE (once under the broadcast
      // aggregate, once as the probe side) and neither exchange reuse
      // nor CTE dedup rescued it — each arm's bm25/cosine DAG ran twice
      // per fuse. The arm is top-k-bounded (≤ its list length), so the
      // single-partition window frame is ≤k rows by construction.
      val w = Window.partitionBy()
      df.select(col("doc_id"), col("score"),
          min("score").over(w).as("mn"), max("score").over(w).as("mx"))
        .select(col("doc_id"),
          when(col("mx") === col("mn"), 1.0)
            .otherwise(round((col("score") - col("mn")) /
              (col("mx") - col("mn")), 9)).as(out))
    }
    val l = norm(lex, "lex_norm")
    val s = norm(sem, "sem_norm")
    // same no-join merge as rrfFuse: norms are >= 0 and absent docs
    // contribute 0, so max over the union recovers each arm's value
    val fused = l.select(col("doc_id"), col("lex_norm"),
        lit(0.0).as("sem_norm"))
      .unionAll(s.select(col("doc_id"), lit(0.0).as("lex_norm"),
        col("sem_norm")))
      .groupBy("doc_id")
      .agg(max("lex_norm").as("lex_norm"), max("sem_norm").as("sem_norm"))
      .select(col("doc_id"),
        round(round(col("lex_norm") * lit(wLex) +
          col("sem_norm") * lit(1.0 - wLex), 9), 6).as("score"),
        round(col("lex_norm"), 6).as("lex_norm"),
        round(col("sem_norm"), 6).as("sem_norm"))
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("score"),
        col("lex_norm"), col("sem_norm"))
  }
}
