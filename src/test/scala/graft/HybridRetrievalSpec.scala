package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HybridRetrieval
import graft.queries.TextQueries

/** Hybrid-retrieval fusion: RRF and weighted min-max against
  * hand-computed expectations on a tiny fixture, plus the bounded-join
  * plan posture and the end-to-end query shape on the sf fixture. */
class HybridRetrievalSpec extends AnyFunSuite {
  import TestSpark._

  private def ranked(rows: (Long, Long, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("rank", "doc_id", "score")
  }

  test("rrfFuse matches the hand-computed RRF on overlapping lists") {
    // lex: docs 1,2,3 at ranks 1,2,3; sem: docs 3,4 at ranks 1,2.
    val lex = ranked((1L, 1L, 0.9), (2L, 2L, 0.8), (3L, 3L, 0.7))
    val sem = ranked((1L, 3L, 0.99), (2L, 4L, 0.5))
    val got = HybridRetrieval.rrfFuse(lex, sem, k = 10).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toList
    def rr(r: Long) = 1.0 / (60 + r)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 3 appears in both arms and must lead
    val expect = Map(
      1L -> r6(rr(1)), 2L -> r6(rr(2)), 3L -> r6(rr(3) + rr(1)),
      4L -> r6(rr(2)))
    assert(got.head._1 === 3L)
    got.foreach { case (doc, score, lr, sr) =>
      assert(math.abs(score - expect(doc)) < 1e-9, s"doc $doc")
      assert(lr === (if (doc <= 3) doc else 0L))
      assert(sr === (doc match { case 3 => 1L; case 4 => 2L; case _ => 0L }))
    }
    // fused ordering: score desc, doc_id asc
    val scores = got.map(_._2)
    assert(scores === scores.sorted(Ordering[Double].reverse))
  }

  test("minMaxFuse normalizes each arm onto [0,1] and fuses convexly") {
    val lex = ranked((1L, 1L, 10.0), (2L, 2L, 6.0), (3L, 3L, 2.0))
    val sem = ranked((1L, 2L, 0.8), (2L, 4L, 0.4))
    val got = HybridRetrieval.minMaxFuse(lex, sem, k = 10).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toList
    val byDoc = got.map(t => t._1 -> t).toMap
    // lex norms: 10->1.0, 6->0.5, 2->0.0; sem norms: 0.8->1.0, 0.4->0.0
    assert(byDoc(1L)._3 === 1.0 && byDoc(1L)._4 === 0.0)
    assert(byDoc(2L)._3 === 0.5 && byDoc(2L)._4 === 1.0)
    assert(byDoc(3L)._3 === 0.0)
    assert(byDoc(4L)._4 === 0.0) // min of a 2-row arm list
    // doc 2: 0.5*0.5 + 0.5*1.0 = 0.75 — the both-arms doc leads
    assert(math.abs(byDoc(2L)._2 - 0.75) < 1e-9)
    assert(got.head._1 === 2L)
    got.foreach { case (_, s, l, m) =>
      assert(s >= 0.0 && s <= 1.0 && l >= 0.0 && l <= 1.0 &&
        m >= 0.0 && m <= 1.0)
    }
  }

  test("minMaxFuse: a constant-score arm maps to 1.0, not NaN") {
    val lex = ranked((1L, 1L, 0.5), (2L, 2L, 0.5))
    val sem = ranked((1L, 2L, 0.9), (2L, 3L, 0.1))
    val got = HybridRetrieval.minMaxFuse(lex, sem, k = 10).collect()
    assert(got.forall(!_.getDouble(2).isNaN))
    val byDoc = got.map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(byDoc(1L) === 1.0 && byDoc(2L) === 1.0)
  }

  test("sparseCosineTopK == driver-side exact cosine on the hash embeddings") {
    val sfDir = TestSpark.sfDir
    val docToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "\\s+"),
          t => length(t) > 0)).as("tok"))
    val dv = HybridRetrieval.hashEmbed(docToks)
    import spark.implicits._
    val qToks = Seq("the", "data", "model").toDF("tok")
      .select(lit(0L).as("qid"), col("tok"))
    val qv = HybridRetrieval.hashEmbed(qToks, idCol = "qid")
    val got = HybridRetrieval.sparseCosineTopK(dv, qv, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    // driver-side oracle: dense-ify and rank (score desc, id asc)
    val q = qv.collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val exact = dv.collect().groupBy(_.getLong(0)).map { case (id, rows) =>
      val micro = rows.map(r => math.rint(r.getDouble(2) * 1e6).toLong *
        math.rint(q.getOrElse(r.getLong(1), 0.0) * 1e6).toLong).sum
      id -> micro
    }.toList.sortBy { case (id, s) => (-s, id) }.take(5)
      .zipWithIndex.map { case ((id, _), i) => (i + 1L, id) }
    assert(got === exact)
  }

  test("fusion plan: union + hash aggregate, never a join of the arm lists") {
    // a FULL OUTER join of the two bounded lists cannot broadcast in
    // Spark (SMJ only) — the union+max merge avoids the join entirely
    val lex = ranked((1L, 1L, 0.9), (2L, 2L, 0.8))
    val sem = ranked((1L, 2L, 0.7), (2L, 3L, 0.6))
    for (df <- Seq(HybridRetrieval.rrfFuse(lex, sem, k = 10),
        HybridRetrieval.minMaxFuse(lex, sem, k = 10))) {
      val plan = df.queryExecution.executedPlan.toString
      // the only join allowed is minMax's broadcast of the 1-row
      // min/max stats frame — never a shuffled join of the lists
      assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("ShuffledHashJoin"),
        s"fusion shuffles a join:\n$plan")
      assert(plan.contains("Union"), s"no union merge:\n$plan")
    }
  }

  test("fusion is partition-count invariant (quantized sums, no float drift)") {
    val sfDir = TestSpark.sfDir
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def run() = TextQueries.queries("hybrid_rrf")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val base = run()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(run() === base, "fused ranking changed with partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("the semantic arm slot accepts a dense ANN tier (kernel kNN over densified hash embeddings)") {
    val sfDir = TestSpark.sfDir
    val docToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "\\s+"),
          t => length(t) > 0)).as("tok"))
    val dv = HybridRetrieval.hashEmbed(docToks)
    import spark.implicits._
    val qToks = Seq("the", "data", "model", "learning", "neural")
      .toDF("tok").select(lit(0L).as("qid"), col("tok"))
    val qv = HybridRetrieval.hashEmbed(qToks, idCol = "qid")
    // densify the sparse rows to 32-dim float arrays — the shape every
    // registered ANN tier consumes
    def densify(sparse: org.apache.spark.sql.DataFrame, id: String) =
      sparse.groupBy(col(id))
        .agg(map_from_arrays(collect_list(col("pos")),
          collect_list(col("val"))).as("m"))
        .select(col(id),
          transform(sequence(lit(0L), lit(31L)),
            i => coalesce(element_at(col("m"), i), lit(0.0))
              .cast("float")).as("vec"))
    val dDense = densify(dv, "doc_id")
      .select(col("doc_id").as("d_id"), col("vec").as("d_vec"))
    val qDense = densify(qv, "qid")
      .select(col("qid").as("q_id"), col("vec").as("q_vec"))
    val viaKernel = graft.operators.KnnKernel
      .bruteForce(spark, qDense, dDense, 50)
      .select("d_id").collect().map(_.getLong(0)).toSet
    val viaSparse = HybridRetrieval.sparseCosineTopK(dv, qv, k = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val overlap = (viaKernel & viaSparse).size.toDouble / viaSparse.size
    assert(overlap >= 0.9,
      s"dense-tier arm diverged from the sparse arm: overlap $overlap")
  }

  test("hybrid_rrf surfaces docs found by only one arm") {
    val sfDir = TestSpark.sfDir
    val rows = TextQueries.queries("hybrid_rrf")(spark, sfDir).collect()
    assert(rows.length === 20)
    val lexOnly = rows.count(r => r.getLong(3) > 0 && r.getLong(4) === 0)
    val semOnly = rows.count(r => r.getLong(3) === 0 && r.getLong(4) > 0)
    val both = rows.count(r => r.getLong(3) > 0 && r.getLong(4) > 0)
    // the fixture corpus is word-salad: the arms agree on some docs and
    // each contributes unique ones — all three populations must exist
    // for the fusion to be doing anything
    assert(both + lexOnly + semOnly === 20)
    assert(both > 0, "no doc ranked by both arms")
    assert(lexOnly + semOnly > 0, "arms fully agree — fusion degenerate")
  }
}
