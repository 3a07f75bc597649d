package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.VectorFunctions._
import graft.operators.{KnnJoin, KnnKernel, SetSim, TopK}

/** Vector-kernel + similarity-search queries over the driver's
  * `embeddings` fixture (vec_id long, embedding array<float> dim=64,
  * label int).
  *
  * Fixture convention (mirrors the reference's fixed-cardinality
  * multivector mode, `set_id = vector_id / c` —
  * `/root/reference/tests/test_search_multivector_rerank.cpp:241-244`):
  * data sets have cardinality C=4, `set_id = vec_id / 4`; the first
  * NQ sets double as query sets.
  *
  * All scores are float32-promoted-to-double, sequential left-fold — the
  * same arithmetic the DuckDB oracle SQL performs — and rounded to 6
  * decimals at the output boundary so hash-compare is stable.
  */
object VectorQueries extends QueryPack {
  val C = 4 // multivector cardinality
  val NQ = 5 // query sets
  val K = 10

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)

  /** (q_id, q_vec) for the query vector subset: vec_id < NQ*C. */
  private def queryVecs(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") < NQ * C)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  private def dataVecs(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id").as("d_id"), col("embedding").as("d_vec"))

  /** Sim triples between query sets and ALL data sets (brute-force rerank
    * input — the fullscan path `RerankAllBySequentialScan`,
    * `/root/reference/src/multivector_reranker.cpp:100-158`). Norms are
    * materialized once per side before the cross join (the reference
    * normalizes at load, `index_bipartite.cpp:37-39`) — the per-pair
    * kernel is a single dot product, and `dot/(‖q‖·‖d‖)` stays
    * bit-identical to the oracle SQL's arithmetic. */
  /** Public accessor for cross-query reuse (EvalQueries scores both set
    * metrics in one pass over these triples). */
  def simTriplesDf(s: SparkSession, dir: String): DataFrame = simTriples(s, dir)

  private def simTriples(s: SparkSession, dir: String): DataFrame = {
    val q = queryVecs(s, dir).withColumn("q_norm", vecNorm(col("q_vec")))
    val d = dataVecs(s, dir).withColumn("d_norm", vecNorm(col("d_vec")))
    d.crossJoin(broadcast(q))
      .select(
        (col("q_id") / C).cast("long").as("qset_id"),
        (col("d_id") / C).cast("long").as("dset_id"),
        (col("q_id") % C).as("q_sub"),
        (col("d_id") % C).as("d_sub"),
        (vecDot(col("q_vec"), col("d_vec")) /
          (col("q_norm") * col("d_norm"))).as("sim"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P2: inner product kernel (distance.h:91-225), pairwise on a slice.
    "p2_vec_dot" -> ((s, dir) => {
      val q = queryVecs(s, dir)
      val d = dataVecs(s, dir).filter(col("d_id") < 50)
      d.crossJoin(broadcast(q))
        .select(col("q_id"), col("d_id"),
          round(vecDot(col("q_vec"), col("d_vec")), 6).as("dot"))
    }),
    // P6 (SQL face): the fused cosine expression (VecCosineExpr /
    // graft_vec_cosine) hash-checked end-to-end against the composed
    // DuckDB spelling — the most common similarity call a SQL user
    // makes, and the route target of the cosine ANN rewrite.
    "p6_vec_cosine" -> ((s, dir) => {
      val q = queryVecs(s, dir)
      val d = dataVecs(s, dir).filter(col("d_id") < 50)
      d.crossJoin(broadcast(q))
        .select(col("q_id"), col("d_id"),
          round(vecCosine(col("q_vec"), col("d_vec")), 6).as("cosine"))
    }),
    // P1: squared-L2 kernel (distance.h:21-89).
    "p1_vec_l2sq" -> ((s, dir) => {
      val q = queryVecs(s, dir)
      val d = dataVecs(s, dir).filter(col("d_id") < 50)
      d.crossJoin(broadcast(q))
        .select(col("q_id"), col("d_id"),
          round(vecL2Sq(col("q_vec"), col("d_vec")), 6).as("l2sq"))
    }),
    // P4: L2-normalize (util.h:214-229) — norm before, 1st element after.
    // Norm is materialized once per row, not recomputed per output column.
    "p4_vec_normalize" -> ((s, dir) => {
      emb(s, dir).filter(col("vec_id") < 100)
        .withColumn("norm_raw", vecNorm(col("embedding")))
        .select(col("vec_id"),
          round(col("norm_raw"), 6).as("norm"),
          round(element_at(col("embedding"), 1).cast("double") /
            col("norm_raw"), 6).as("first_elem_normed"))
    }),
    // DIVERSIFIED top-K, cap flavor: at most m=2 results per label
    // group per query, then the global top-K of the survivors — the
    // relational diversity guard (per-source caps, near-dup-cluster
    // caps) every production retrieval runs when plain top-k collapses
    // onto one cluster. Stage 1 is a bounded-heap aggregate per
    // (query, label); stage 2 ranks the ≤ labels·m survivors per query.
    // Fully deterministic → hash-checked.
    "w1_topk_diverse" -> ((s, dir) => {
      val q = queryVecs(s, dir).withColumn("q_norm", vecNorm(col("q_vec")))
      val d = emb(s, dir)
        .select(col("vec_id").as("d_id"), col("label").cast("long").as("group"),
          col("embedding").as("d_vec"))
        .withColumn("d_norm", vecNorm(col("d_vec")))
      val scored = d.crossJoin(broadcast(q))
        .filter(col("q_id") =!= col("d_id"))
        .select(col("q_id"), col("group"), col("d_id"),
          round(vecDot(col("q_vec"), col("d_vec")) /
            (col("q_norm") * col("d_norm")), 9).as("score"))
      graft.operators.DiverseTopK.capDiversified(scored, m = 2, k = K)
        .select(col("q_id"), col("rank"), col("d_id"), col("group"),
          round(col("score"), 6).as("score"))
    }),
    // DIVERSIFIED top-K, MMR flavor (Carbonell & Goldstein 1998): greedy
    // λ-balanced re-rank of each query's top-50 cosine candidates —
    // next = argmax λ·rel − (1−λ)·max sim-to-selected. Candidate pairs
    // and the greedy loop stay keyed by query in the executors
    // (mapGroups over nCand² bounded rows). HASH-CHECKED since r12: the
    // greedy selection is deterministic (9-quantized inputs, smaller-id
    // ties), so the DuckDB oracle replays it step by step (k unrolled
    // CTE stages — topkMmrOracle); DiverseTopKSpec additionally holds
    // the λ=1 ≡ plain-top-k equality, the hand-computed fixture order,
    // and the duplicate-suppression property.
    "topk_mmr" -> ((s, dir) => {
      // candidate pool ranked on the ROUNDED score with the d_id tie
      // rule — the oracle's exact ordering. The kernel's raw-score
      // top-60 is a strict superset of the rounded top-50 (equal
      // rounded values differ by < 1e-9 raw), so the rank-50 boundary
      // cannot diverge between kernel and oracle on a raw-vs-rounded
      // near-tie.
      val pool = KnnKernel.bruteForce(s, queryVecs(s, dir),
          dataVecs(s, dir), 60, excludeSelf = true)
        .select(col("q_id"), col("d_id"), round(col("score"), 9).as("rel"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
        .orderBy(col("rel").desc, col("d_id").asc)
      val cands = pool.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 50).drop("__rn")
      graft.operators.DiverseTopK.mmr(s, cands,
          dataVecs(s, dir).select(col("d_id"), col("d_vec")), k = K)
        .select(col("q_id"), col("rank"), col("d_id"),
          round(col("mmr_score"), 6).as("mmr_score"),
          round(col("rel"), 6).as("rel"))
    }),
    // J1+W1: brute-force cosine k-NN join, top-K per query vector
    // (bounded-heap top-k; ranks on the 9-decimal-quantized score).
    "j1_knn_cosine" -> ((s, dir) => {
      KnnJoin.bruteForce(queryVecs(s, dir), dataVecs(s, dir), K,
          metric = "cosine", excludeSelf = true)
        .select(col("q_id"), col("rank"), col("d_id"),
          round(col("score"), 6).as("score"))
    }),
    // J1 kernel tier: same semantics/oracle as j1_knn_cosine but with the
    // broadcast-queries / streaming-data orientation (KnnKernel) — the
    // shape that survives a corpus too big to broadcast.
    "j1_knn_block" -> ((s, dir) => {
      KnnKernel.bruteForce(s, queryVecs(s, dir), dataVecs(s, dir), K,
          excludeSelf = true)
        .select(col("q_id"), col("rank"), col("d_id"),
          round(col("score"), 6).as("score"))
    }),
    // A2+W1: summed-max-similarity (MaxSim) set-to-set top-K rerank —
    // single-shuffle MaxSimAggregator + bounded-heap top-k.
    "a2_maxsim_topk" -> ((s, dir) => {
      val scored = SetSim.maxSimAgg(simTriples(s, dir))
        .withColumn("score", round(col("score"), 9))
      TopK.perGroupAgg(scored, Seq(col("qset_id")),
          col("score"), col("dset_id"), K, idName = "dset_id")
        .select(col("qset_id"), col("rank"), col("dset_id"),
          round(col("score"), 6).as("score"))
    }),
    // A1+W1: smooth-Chamfer set-to-set top-K rerank — single-shuffle
    // ChamferAggregator + bounded-heap top-k.
    "a1_smooth_chamfer_topk" -> ((s, dir) => {
      val scored = SetSim.smoothChamferAgg(simTriples(s, dir), C)
        .withColumn("score", round(col("score"), 9))
      TopK.perGroupAgg(scored, Seq(col("qset_id")),
          col("score"), col("dset_id"), K, idName = "dset_id")
        .select(col("qset_id"), col("rank"), col("dset_id"),
          round(col("score"), 6).as("score"))
    }),

    // W3: full GT ranking — k = ALL sets (`RerankAllAndGenerateSetGroundTruth`
    // sets k to the set count, multivector_reranker.cpp:160-181).
    "w3_full_ranking" -> ((s, dir) => {
      val scored = SetSim.smoothChamferAgg(simTriples(s, dir), C)
        .withColumn("score", round(col("score"), 9))
      TopK.perGroupAgg(scored, Seq(col("qset_id")),
          col("score"), col("dset_id"), Int.MaxValue, idName = "dset_id")
        .select(col("qset_id"), col("rank"), col("dset_id"),
          round(col("score"), 6).as("score"))
    }),

    // P3: FastL2 norm-cache rewrite — ‖a‖² + ‖b‖² − 2⟨a,b⟩ from
    // MATERIALIZED squared norms (distance.h:226-321), the classic
    // norm-cache identity instead of the direct difference sum.
    "p3_fastl2_rewrite" -> ((s, dir) => {
      val q = queryVecs(s, dir)
        .withColumn("q_nsq", vecDot(col("q_vec"), col("q_vec")))
      val d = dataVecs(s, dir).filter(col("d_id") < 50)
        .withColumn("d_nsq", vecDot(col("d_vec"), col("d_vec")))
      d.crossJoin(broadcast(q))
        .select(col("q_id"), col("d_id"),
          round(col("q_nsq") + col("d_nsq") -
            lit(2.0) * vecDot(col("q_vec"), col("d_vec")), 6).as("l2sq"))
    }),

    // P9 (true semantics): candidate vector ids → set ids, dedup — the
    // rerank front door (multivector_reranker.cpp:42-51).
    "p9_set_dedup" -> ((s, dir) => {
      KnnJoin.bruteForce(queryVecs(s, dir), dataVecs(s, dir), K,
          metric = "cosine", excludeSelf = true)
        .select((col("q_id") / C).cast("long").as("qset_id"),
          (col("d_id") / C).cast("long").as("dset_id"))
        .distinct()
    }),

    // S16 (true semantics): vector-set splitter — semi/anti join of the
    // corpus against a sampled set-id list (tests/extract_vectorsets.cpp).
    "s16_vecset_split" -> ((s, dir) => {
      val m = emb(s, dir).select(col("vec_id"),
        (col("vec_id") / C).cast("long").as("set_id"))
      val sampled = m.select("set_id").distinct()
        .filter(col("set_id") % 3 === 0)
      val inS = m.join(sampled, Seq("set_id"), "left_semi")
        .select(col("vec_id"), col("set_id"), lit(1).as("in_sample"))
      val outS = m.join(sampled, Seq("set_id"), "left_anti")
        .select(col("vec_id"), col("set_id"), lit(0).as("in_sample"))
      inS.unionByName(outS)
    })
  )

  // DuckDB equivalents. Table names are bound by the driver to the same
  // parquet files. dot-product spec: same float→double promotion and
  // sequential left fold (list_sum over the transformed pair list).
  private val dotSql =
    "list_sum(list_transform(list_zip(q.embedding, d.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
  private def dotSqlAB(a: String, b: String) =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
  private val normSql =
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
  private def normSqlOf(t: String) =
    s"sqrt(list_sum(list_transform($t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
  private def cosineSql(a: String, b: String) =
    s"(${dotSqlAB(s"$a.embedding", s"$b.embedding")} / (${normSqlOf(a)} * ${normSqlOf(b)}))"

  /** Oracle for BOTH j1 variants (relational and kernel tier). */
  private lazy val j1OracleSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < ${NQ * C}),
       |d AS (SELECT vec_id AS d_id, embedding FROM embeddings),
       |scored AS (
       |  SELECT q.q_id, d.d_id, round(${cosineSql("q", "d")}, 9) AS score
       |  FROM q CROSS JOIN d WHERE q.q_id <> d.d_id),
       |ranked AS (
       |  SELECT q_id, d_id, score,
       |         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, d_id ASC) AS rank
       |  FROM scored)
       |SELECT q_id, rank, d_id, round(score, 6) AS score FROM ranked WHERE rank <= $K""".stripMargin

  /** topk_mmr oracle — the GREEDY MMR selection replayed in SQL by
    * unrolling the k selection steps as chained CTEs (k is a fixture
    * constant, so the unrolled text is a fixed statement; a recursive
    * CTE would need aggregation in the recursive term, which SQL
    * forbids). Stage i computes every remaining candidate's
    * max-sim-to-selected via the precomputed candidate-pair sims and
    * picks argmax(λ·rel − (1−λ)·maxsim) with the smaller-id tie rule —
    * exactly [[graft.operators.DiverseTopK.mmr]]'s executor loop on
    * the same 9-quantized inputs and the same IEEE double arithmetic;
    * `round_even` mirrors the kernel's `math.rint` output grid. */
  private lazy val topkMmrOracle: String = {
    val nCand = 50
    val stages = (2 to K).map { i =>
      s"""pen$i AS (
         |  SELECT c.q_id, c.d_id, c.rel, max(s.sim) AS ms
         |  FROM cands c
         |  JOIN picked${i - 1} p ON p.q_id = c.q_id
         |  JOIN sims s ON s.q_id = c.q_id
         |    AND s.a_id = LEAST(c.d_id, p.d_id)
         |    AND s.b_id = GREATEST(c.d_id, p.d_id)
         |  WHERE NOT EXISTS (SELECT 1 FROM picked${i - 1} pp
         |                    WHERE pp.q_id = c.q_id AND pp.d_id = c.d_id)
         |  GROUP BY c.q_id, c.d_id, c.rel),
         |sel$i AS (
         |  SELECT q_id, d_id, rel, v FROM (
         |    SELECT q_id, d_id, rel, 0.5 * rel - 0.5 * ms AS v,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY 0.5 * rel - 0.5 * ms DESC, d_id ASC) AS rn
         |    FROM pen$i) t WHERE rn = 1),
         |picked$i AS MATERIALIZED (SELECT * FROM picked${i - 1} UNION ALL
         |             SELECT q_id, d_id, rel, v, $i AS rank FROM sel$i)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < ${NQ * C}),
       |d AS (SELECT vec_id AS d_id, embedding FROM embeddings),
       |scored AS (
       |  SELECT q.q_id, d.d_id, round(${cosineSql("q", "d")}, 9) AS score
       |  FROM q CROSS JOIN d WHERE q.q_id <> d.d_id),
       |cands AS MATERIALIZED (
       |  SELECT q_id, d_id, score AS rel FROM (
       |    SELECT q_id, d_id, score,
       |           row_number() OVER (PARTITION BY q_id
       |             ORDER BY score DESC, d_id ASC) AS rn
       |    FROM scored) t WHERE rn <= $nCand),
       |cv AS (SELECT c.q_id, c.d_id, e.embedding
       |       FROM cands c JOIN d e ON e.d_id = c.d_id),
       |sims AS MATERIALIZED (
       |  SELECT a.q_id, a.d_id AS a_id, b.d_id AS b_id,
       |         round(${cosineSql("a", "b")}, 9) AS sim
       |  FROM cv a JOIN cv b ON a.q_id = b.q_id AND a.d_id < b.d_id),
       |sel1 AS (
       |  SELECT q_id, d_id, rel, v FROM (
       |    SELECT q_id, d_id, rel, 0.5 * rel AS v,
       |           row_number() OVER (PARTITION BY q_id
       |             ORDER BY 0.5 * rel DESC, d_id ASC) AS rn
       |    FROM cands) t WHERE rn = 1),
       |picked1 AS (SELECT q_id, d_id, rel, v, 1 AS rank FROM sel1)$stages
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, d_id,
       |       round(round_even(v * 1000000, 0) / 1000000, 6) AS mmr_score,
       |       round(round_even(rel * 1000000, 0) / 1000000, 6) AS rel
       |FROM picked$K""".stripMargin
  }

  /** Shared CTE: cosine sim triples between query sets and all data. */
  private val simTriplesCte =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < ${NQ * C}),
       |d AS (SELECT vec_id AS d_id, embedding FROM embeddings),
       |sims AS (
       |  SELECT CAST(q.q_id // $C AS BIGINT) AS qset_id,
       |         CAST(d.d_id // $C AS BIGINT) AS dset_id,
       |         q.q_id % $C AS q_sub, d.d_id % $C AS d_sub,
       |         ${cosineSql("q", "d")} AS sim
       |  FROM q CROSS JOIN d)""".stripMargin

  def oracles: Map[String, String] = Map(
    "p3_fastl2_rewrite" -> {
      def nsq(t: String) =
        s"list_sum(list_transform($t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
      s"""SELECT q.vec_id AS q_id, d.vec_id AS d_id,
         |round(${nsq("q")} + ${nsq("d")} - 2.0 * $dotSql, 6) AS l2sq
         |FROM (SELECT * FROM embeddings WHERE vec_id < ${NQ * C}) q
         |CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 50) d""".stripMargin
    },
    "p9_set_dedup" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < ${NQ * C}),
         |d AS (SELECT vec_id AS d_id, embedding FROM embeddings),
         |scored AS (
         |  SELECT q.q_id, d.d_id, round(${cosineSql("q", "d")}, 9) AS score
         |  FROM q CROSS JOIN d WHERE q.q_id <> d.d_id),
         |ranked AS (
         |  SELECT q_id, d_id,
         |         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, d_id ASC) AS rank
         |  FROM scored)
         |SELECT DISTINCT q_id // $C AS qset_id, d_id // $C AS dset_id
         |FROM ranked WHERE rank <= $K""".stripMargin,
    "s16_vecset_split" ->
      s"""WITH m AS (SELECT vec_id, CAST(vec_id // $C AS BIGINT) AS set_id FROM embeddings),
         |sampled AS (SELECT DISTINCT set_id FROM m WHERE set_id % 3 = 0)
         |SELECT vec_id, set_id, 1 AS in_sample FROM m
         |WHERE EXISTS (SELECT 1 FROM sampled s WHERE s.set_id = m.set_id)
         |UNION ALL
         |SELECT vec_id, set_id, 0 AS in_sample FROM m
         |WHERE NOT EXISTS (SELECT 1 FROM sampled s WHERE s.set_id = m.set_id)""".stripMargin,
    "p2_vec_dot" ->
      s"""SELECT q.vec_id AS q_id, d.vec_id AS d_id, round($dotSql, 6) AS dot
         |FROM (SELECT * FROM embeddings WHERE vec_id < ${NQ * C}) q
         |CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 50) d""".stripMargin,
    "p6_vec_cosine" ->
      s"""SELECT q.vec_id AS q_id, d.vec_id AS d_id,
         |round(${cosineSql("q", "d")}, 6) AS cosine
         |FROM (SELECT * FROM embeddings WHERE vec_id < ${NQ * C}) q
         |CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 50) d""".stripMargin,
    "p1_vec_l2sq" ->
      s"""SELECT q.vec_id AS q_id, d.vec_id AS d_id,
         |round(list_sum(list_transform(list_zip(q.embedding, d.embedding),
         |  x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), 6) AS l2sq
         |FROM (SELECT * FROM embeddings WHERE vec_id < ${NQ * C}) q
         |CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 50) d""".stripMargin,
    "p4_vec_normalize" ->
      s"""SELECT vec_id, round($normSql, 6) AS norm,
         |round(CAST(embedding[1] AS DOUBLE) / $normSql, 6) AS first_elem_normed
         |FROM embeddings WHERE vec_id < 100""".stripMargin,
    "w1_topk_diverse" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < ${NQ * C}),
         |d AS (SELECT vec_id AS d_id, CAST(label AS BIGINT) AS "group", embedding FROM embeddings),
         |scored AS (
         |  SELECT q.q_id, d."group", d.d_id,
         |         round(${cosineSql("q", "d")}, 9) AS score
         |  FROM q CROSS JOIN d WHERE q.q_id <> d.d_id),
         |capped AS (
         |  SELECT q_id, "group", d_id, score,
         |         row_number() OVER (PARTITION BY q_id, "group"
         |           ORDER BY score DESC, d_id ASC) AS lrank
         |  FROM scored),
         |surv AS (SELECT * FROM capped WHERE lrank <= 2),
         |ranked AS (
         |  SELECT q_id, d_id, "group", score,
         |         CAST(row_number() OVER (PARTITION BY q_id
         |           ORDER BY score DESC, d_id ASC) AS BIGINT) AS rank
         |  FROM surv)
         |SELECT q_id, rank, d_id, "group", round(score, 6) AS score
         |FROM ranked WHERE rank <= $K""".stripMargin,
    "topk_mmr" -> topkMmrOracle,
    "j1_knn_cosine" -> j1OracleSql,
    // identical semantics, kernel-tier execution — same oracle
    "j1_knn_block" -> j1OracleSql,
    "a2_maxsim_topk" ->
      s"""$simTriplesCte,
         |per_i AS (
         |  SELECT qset_id, dset_id, q_sub, max(sim) AS max_sim
         |  FROM sims GROUP BY qset_id, dset_id, q_sub),
         |scored AS (
         |  SELECT qset_id, dset_id, round(sum(max_sim), 9) AS score
         |  FROM per_i GROUP BY qset_id, dset_id),
         |ranked AS (
         |  SELECT qset_id, dset_id, score,
         |         row_number() OVER (PARTITION BY qset_id ORDER BY score DESC, dset_id ASC) AS rank
         |  FROM scored)
         |SELECT qset_id, rank, dset_id, round(score, 6) AS score FROM ranked WHERE rank <= $K""".stripMargin,
    // a2_sql_saturated (defined in AnnQueries): the routed MaxSim
    // relation plan at saturating beam budget must reproduce the
    // exhaustive summed-max ranking EXACTLY — a2's oracle shape, minus
    // the rank column (the routed statement doesn't emit it)
    "a2_sql_saturated" ->
      s"""$simTriplesCte,
         |per_i AS (
         |  SELECT qset_id, dset_id, q_sub, max(sim) AS max_sim
         |  FROM sims GROUP BY qset_id, dset_id, q_sub),
         |scored AS (
         |  SELECT qset_id, dset_id, round(sum(max_sim), 9) AS score
         |  FROM per_i GROUP BY qset_id, dset_id),
         |ranked AS (
         |  SELECT qset_id, dset_id, score,
         |         row_number() OVER (PARTITION BY qset_id ORDER BY score DESC, dset_id ASC) AS rank
         |  FROM scored)
         |SELECT qset_id, dset_id, round(score, 6) AS score FROM ranked WHERE rank <= $K""".stripMargin,
    // a2_sql_sharded_saturated (defined in AnnQueries): the same
    // MaxSim statement answered by the SHARDED mv tier at per-shard
    // saturating budget — same exhaustive oracle
    "a2_sql_sharded_saturated" ->
      s"""$simTriplesCte,
         |per_i AS (
         |  SELECT qset_id, dset_id, q_sub, max(sim) AS max_sim
         |  FROM sims GROUP BY qset_id, dset_id, q_sub),
         |scored AS (
         |  SELECT qset_id, dset_id, round(sum(max_sim), 9) AS score
         |  FROM per_i GROUP BY qset_id, dset_id),
         |ranked AS (
         |  SELECT qset_id, dset_id, score,
         |         row_number() OVER (PARTITION BY qset_id ORDER BY score DESC, dset_id ASC) AS rank
         |  FROM scored)
         |SELECT qset_id, dset_id, round(score, 6) AS score FROM ranked WHERE rank <= $K""".stripMargin,
    "a1_smooth_chamfer_topk" ->
      s"""$chamferRankedCtes
         |SELECT qset_id, rank, dset_id, round(score, 6) AS score FROM ranked WHERE rank <= $K""".stripMargin,
    "w3_full_ranking" ->
      s"""$chamferRankedCtes
         |SELECT qset_id, rank, dset_id, round(score, 6) AS score FROM ranked""".stripMargin,
    // g9_sql_saturated (defined in AnnQueries): the routed SQL
    // multivector plan at saturating beam budget must reproduce the
    // fullscan chamfer ranking EXACTLY — same CTEs as a1's oracle,
    // minus the rank column (the routed statement doesn't emit it)
    "g9_sql_saturated" ->
      s"""$chamferRankedCtes
         |SELECT qset_id, dset_id, round(score, 6) AS score FROM ranked WHERE rank <= $K""".stripMargin,
    // g9_sql_sharded_saturated (defined in AnnQueries): the same
    // statement answered by the SHARDED mv tier at per-shard
    // saturating budget — same exhaustive oracle
    "g9_sql_sharded_saturated" ->
      s"""$chamferRankedCtes
         |SELECT qset_id, dset_id, round(score, 6) AS score FROM ranked WHERE rank <= $K""".stripMargin,
    // g9_sql_versioned_grace (defined in AnnQueries): the same
    // statement answered by the SUPERSEDED pre-compact generation of a
    // versioned sharded index (grace reader) — the grace generation
    // covers the full corpus, so the oracle is unchanged
    "g9_sql_versioned_grace" ->
      s"""$chamferRankedCtes
         |SELECT qset_id, dset_id, round(score, 6) AS score FROM ranked WHERE rank <= $K""".stripMargin
  )

  /** Shared oracle CTE chain: exhaustive smooth-Chamfer scoring of all
    * (query set, corpus set) pairs, round-9 quantized, rank-windowed
    * (score DESC, dset_id ASC) — consumed by the a1 top-k, w3 full
    * ranking, and g9_sql_saturated oracles. */
  private lazy val chamferRankedCtes: String = {
    val ts = SetSim.Temperature * SetSim.TxtScale
    val t = SetSim.Temperature
    s"""$simTriplesCte,
       |rl AS (
       |  SELECT qset_id, dset_id, q_sub, m + ln(sum(exp(x - m))) AS lse FROM (
       |    SELECT qset_id, dset_id, q_sub, sim * $ts AS x,
       |           max(sim * $ts) OVER (PARTITION BY qset_id, dset_id, q_sub) AS m
       |    FROM sims) GROUP BY qset_id, dset_id, q_sub, m),
       |cl AS (
       |  SELECT qset_id, dset_id, d_sub, m + ln(sum(exp(x - m))) AS lse FROM (
       |    SELECT qset_id, dset_id, d_sub, sim * $t AS x,
       |           max(sim * $t) OVER (PARTITION BY qset_id, dset_id, d_sub) AS m
       |    FROM sims) GROUP BY qset_id, dset_id, d_sub, m),
       |t1 AS (SELECT qset_id, dset_id, sum(lse) AS s1 FROM rl GROUP BY qset_id, dset_id),
       |t2 AS (SELECT qset_id, dset_id, sum(lse) AS s2 FROM cl GROUP BY qset_id, dset_id),
       |scored AS (
       |  SELECT t1.qset_id, t1.dset_id,
       |         round((t1.s1 / (${C.toDouble} * $ts) + t2.s2 / (${C.toDouble} * $t)) / ${SetSim.Denominator}, 9) AS score
       |  FROM t1 JOIN t2 ON t1.qset_id = t2.qset_id AND t1.dset_id = t2.dset_id),
       |ranked AS (
       |  SELECT qset_id, dset_id, score,
       |         row_number() OVER (PARTITION BY qset_id ORDER BY score DESC, dset_id ASC) AS rank
       |  FROM scored)""".stripMargin
  }
}
