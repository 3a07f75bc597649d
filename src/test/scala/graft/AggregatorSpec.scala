package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ChamferAggregator, MaxSimAggregator, ScoredId, TopKAggregator}
import graft.operators.{KnnJoin, SetSim, TopK}

/** Unit + plan-shape tests for the bounded-heap TopKAggregator and the
  * single-pass set-similarity aggregators. */
class AggregatorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // --- TopKAggregator scalar semantics -------------------------------

  test("TopKAggregator keeps top-k with score-desc id-asc order") {
    val agg = new TopKAggregator(3)
    val items = Seq(
      ScoredId(1.0, 5), ScoredId(3.0, 2), ScoredId(2.0, 7),
      ScoredId(3.0, 1), ScoredId(0.5, 9), ScoredId(2.0, 3))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) ===
      Seq(ScoredId(3.0, 1), ScoredId(3.0, 2), ScoredId(2.0, 3)))
  }

  test("TopKAggregator merge equals single-buffer result") {
    val agg = new TopKAggregator(5)
    val rnd = new Random(42)
    val items = Seq.fill(200)(ScoredId(rnd.nextInt(50) / 10.0, rnd.nextInt(100)))
    val (l, r) = items.splitAt(97)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val direct = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(merged) === agg.finish(direct))
    // and it matches a full sort truncation
    val expectFull = items.sortBy(s => (-s.score, s.id)).take(5)
    assert(agg.finish(direct) === expectFull)
  }

  test("perGroupAgg matches window perGroup") {
    val df = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.7), (1L, 12L, 0.95), (1L, 13L, 0.7),
      (2L, 10L, 0.1), (2L, 11L, 0.3), (2L, 12L, 0.2))
      .toDF("g", "id", "score")
    val viaAgg = TopK.perGroupAgg(df, Seq(col("g")), col("score"), col("id"), 2)
      .orderBy("g", "rank").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val viaWin = TopK.perGroup(df, Seq(col("g")),
        Seq(col("score").desc, col("id").asc), 2)
      .select(col("g"), col("rank"), col("id"), col("score"))
      .orderBy("g", "rank").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(viaAgg === viaWin)
  }

  // --- plan shape: hot paths partial-aggregate, not window-sort -------

  test("j1 hot path plans ObjectHashAggregate, no Window") {
    val q = Tables.embeddings(spark, sfDir).limit(8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val d = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("d_id"), col("embedding").as("d_vec"))
    val plan = KnnJoin.bruteForce(q, d, 5).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no partial agg in:\n$plan")
    assert(!plan.contains("Window"), s"window sort on hot path:\n$plan")
  }

  // --- set-sim aggregators vs relational spec -------------------------

  private def simTriplesFixture = {
    val rnd = new Random(7)
    val rows = for {
      qset <- 0 until 3; dset <- 0 until 4
      i <- 0 until 3; j <- 0 until 3
    } yield (qset.toLong, dset.toLong, i, j, rnd.nextDouble() * 2 - 1)
    rows.toDF("qset_id", "dset_id", "q_sub", "d_sub", "sim")
  }

  test("set-metric registry dispatches both scorers and rejects unknowns") {
    val df = simTriplesFixture
    val viaReg = SetSim("smooth_chamfer")(df, 3).orderBy("qset_id", "dset_id")
      .collect().map(_.getDouble(2))
    val direct = SetSim.smoothChamferAgg(df, 3).orderBy("qset_id", "dset_id")
      .collect().map(_.getDouble(2))
    assert(viaReg.toSeq === direct.toSeq)
    assert(SetSim("summed_max_similarity")(df, 3).count() > 0)
    assertThrows[IllegalArgumentException](SetSim("chamfer_typo"))
  }

  test("maxSimAgg matches two-stage relational maxSim") {
    val df = simTriplesFixture
    val a = SetSim.maxSimAgg(df).orderBy("qset_id", "dset_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = SetSim.maxSim(df).orderBy("qset_id", "dset_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    a.zip(b).foreach { case ((q1, d1, s1), (q2, d2, s2)) =>
      assert((q1, d1) === (q2, d2))
      assert(math.abs(s1 - s2) < 1e-12, s"($q1,$d1): $s1 vs $s2")
    }
  }

  test("smoothChamferAgg matches windowed relational smoothChamfer") {
    val df = simTriplesFixture
    val a = SetSim.smoothChamferAgg(df, cQ = 3).orderBy("qset_id", "dset_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = SetSim.smoothChamfer(df, c = 3).orderBy("qset_id", "dset_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    a.zip(b).foreach { case ((q1, d1, s1), (q2, d2, s2)) =>
      assert((q1, d1) === (q2, d2))
      assert(math.abs(s1 - s2) < 1e-12, s"($q1,$d1): $s1 vs $s2")
    }
  }

  test("ChamferAggregator matches direct matrix formula") {
    // scalar re-implementation on a tiny 2x3 sim matrix
    val sims = Array(Array(0.9, -0.2, 0.4), Array(0.1, 0.8, -0.5))
    val t = 16.0; val s = 1.0; val c = 2
    def lse(xs: Seq[Double]): Double = {
      val m = xs.max; m + math.log(xs.map(x => math.exp(x - m)).sum)
    }
    val term1 = (0 until 2).map(i => lse((0 until 3).map(j => t * s * sims(i)(j)))).sum / (c * t * s)
    val term2 = (0 until 3).map(j => lse((0 until 2).map(i => t * sims(i)(j)))).sum / (c * t)
    val expect = (term1 + term2) / 2.0
    val agg = new ChamferAggregator(c)
    val buf = agg.zero
    for (i <- 0 until 2; j <- 0 until 3)
      agg.reduce(buf, graft.functions.SubSim(i, j, sims(i)(j)))
    assert(math.abs(agg.finish(buf) - expect) < 1e-14)
  }
}
