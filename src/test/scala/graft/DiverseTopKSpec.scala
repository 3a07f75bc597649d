package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DiverseTopK, KnnKernel}
import graft.queries.VectorQueries

/** Diversified top-k: cap semantics, MMR greedy order on a
  * hand-computed fixture, the λ=1 degeneracy to plain top-k, and the
  * duplicate-suppression property that motivates MMR. */
class DiverseTopKSpec extends AnyFunSuite {
  import TestSpark._

  test("capDiversified: at most m per group, global re-rank of survivors") {
    import spark.implicits._
    // one query, two groups; group 10 holds the 3 best scores
    val scored = Seq(
      (1L, 10L, 101L, 0.9), (1L, 10L, 102L, 0.8), (1L, 10L, 103L, 0.7),
      (1L, 20L, 201L, 0.6), (1L, 20L, 202L, 0.5), (1L, 20L, 203L, 0.4))
      .toDF("q_id", "group", "d_id", "score")
    val got = DiverseTopK.capDiversified(scored, m = 2, k = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // 103 is capped out of group 10; the global ranking then interleaves
    assert(got.toSeq === Seq((1L, 101L), (2L, 102L), (3L, 201L), (4L, 202L)))
  }

  test("mmr: duplicate candidate is deferred below the diverse one") {
    import spark.implicits._
    // a (id 1) and b (id 2) are identical vectors; c (id 3) equally
    // relevant but diverse. Greedy: a first (tie with b -> smaller id),
    // then c (b's sim-to-selected is 1.0), b last.
    val vecs = Seq(
      (1L, Array(0.8f, 0.6f)), (2L, Array(0.8f, 0.6f)),
      (3L, Array(0.8f, -0.6f)))
      .toDF("d_id", "d_vec")
    val cands = Seq((7L, 1L, 0.8), (7L, 2L, 0.8), (7L, 3L, 0.8))
      .toDF("q_id", "d_id", "rel")
    val got = DiverseTopK.mmr(spark, cands, vecs, k = 3, lambda = 0.5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._2).toSeq === Seq(1L, 3L, 2L))
    // hand-computed objective values: rank1 = λ·rel = 0.4;
    // rank2 (c): 0.5·0.8 − 0.5·sim(c,a) = 0.4 − 0.5·0.28 = 0.26;
    // rank3 (b): 0.4 − 0.5·1.0 = −0.1
    assert(math.abs(got(0)._3 - 0.4) < 1e-6)
    assert(math.abs(got(1)._3 - 0.26) < 1e-6)
    assert(math.abs(got(2)._3 - (-0.1)) < 1e-6)
  }

  test("mmr with lambda=1 degenerates to plain top-k order") {
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val d = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("d_id"), col("embedding").as("d_vec"))
    val cands = KnnKernel.bruteForce(spark, q, d, 30, excludeSelf = true)
      .select(col("q_id"), col("d_id"), round(col("score"), 9).as("rel"))
    val plain = cands.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(
        _.sortBy(t => (-t._3, t._2)).take(10).map(_._2).toSeq).toMap
    val viaMmr = DiverseTopK.mmr(spark, cands,
        d.select(col("d_id"), col("d_vec")), k = 10, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(
        _.sortBy(_._2).map(_._3).toSeq).toMap
    assert(viaMmr === plain)
  }

  test("w1_topk_diverse enforces the per-label cap the plain top-k violates") {
    val rows = VectorQueries.queries("w1_topk_diverse")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val perQG = rows.groupBy(r => (r.getLong(0), r.getLong(3)))
    perQG.foreach { case ((qid, g), rs) =>
      assert(rs.length <= 2, s"query $qid label $g got ${rs.length} > m=2")
    }
    // ranks are 1..n contiguous per query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length).toSeq)
    }
  }

  test("mmr fails loudly when a candidate has no vector") {
    import spark.implicits._
    // d_id=2 is missing from vecs: a silent inner-join drop would leave
    // it selectable but never diversity-penalized — must throw instead
    val vecs = Seq((1L, Array(0.8f, 0.6f)), (3L, Array(0.8f, -0.6f)))
      .toDF("d_id", "d_vec")
    val cands = Seq((7L, 1L, 0.8), (7L, 2L, 0.8), (7L, 3L, 0.8))
      .toDF("q_id", "d_id", "rel")
    val e = intercept[Exception] {
      DiverseTopK.mmr(spark, cands, vecs, k = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("has no vector")), s"$e")
  }

  test("mmr: a legitimate d_id equal to an old sentinel value is handled") {
    import spark.implicits._
    // -1 used to be the rel-row sentinel; a real candidate with that id
    // must flow through pairs + selection like any other
    val vecs = Seq((-1L, Array(1.0f, 0.0f)), (5L, Array(0.0f, 1.0f)))
      .toDF("d_id", "d_vec")
    val cands = Seq((7L, -1L, 0.9), (7L, 5L, 0.5)).toDF("q_id", "d_id", "rel")
    val got = DiverseTopK.mmr(spark, cands, vecs, k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(4)))
    assert(got.toSeq === Seq((-1L, 0.9), (5L, 0.5)))
  }

  test("topk_mmr emits k contiguous ranks per query with valid candidates") {
    val rows = VectorQueries.queries("topk_mmr")(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length).toSeq)
      assert(rs.length === 10, s"query $qid got ${rs.length} rows")
      // rank-1 is the relevance argmax (no penalty yet)
      val first = rs.minBy(_.getLong(1))
      assert(first.getDouble(4) === rs.map(_.getDouble(4)).max)
    }
  }
}
