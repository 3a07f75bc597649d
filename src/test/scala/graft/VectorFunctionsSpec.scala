package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.SetSim

/** Unit checks of the vector kernels against scalar re-implementations
  * (SURVEY §5: ScalaTest per expression). */
class VectorFunctionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val a = Array(1.0f, 2.0f, 3.0f)
  private val b = Array(-1.0f, 0.5f, 2.0f)

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(c.cast("double")).head.getDouble(0)

  test("vecDot matches scalar") {
    assert(math.abs(one(vecDot(col("a"), col("b"))) - (-1 + 1 + 6)) < 1e-9)
  }

  test("vecL2Sq matches scalar") {
    val exp = math.pow(2, 2) + math.pow(1.5, 2) + 1
    assert(math.abs(one(vecL2Sq(col("a"), col("b"))) - exp) < 1e-9)
  }

  test("vecCosine in [-1, 1] and symmetric") {
    val c1 = one(vecCosine(col("a"), col("b")))
    val c2 = one(vecCosine(col("b"), col("a")))
    assert(c1 >= -1.0 - 1e-12 && c1 <= 1.0 + 1e-12)
    assert(math.abs(c1 - c2) < 1e-12)
  }

  test("vecNormalize yields unit norm") {
    val n = Seq(Tuple1(a)).toDF("a")
      .select(vecNorm(vecNormalize(col("a"))).as("n"))
      .head.getDouble(0)
    assert(math.abs(n - 1.0) < 1e-6)
  }

  test("smoothChamfer matches scalar reference formula on a tiny case") {
    // Q = 2 vectors, D = 2 vectors, known sims
    val sims = Seq(
      (0L, 0L, 0, 0, 0.9), (0L, 0L, 0, 1, 0.1),
      (0L, 0L, 1, 0, 0.2), (0L, 0L, 1, 1, 0.8))
      .toDF("qset_id", "dset_id", "q_sub", "d_sub", "sim")
    val got = SetSim.smoothChamfer(sims, c = 2)
      .head.getAs[Double]("score")
    // scalar replication of multivector_reranker.cpp:330-375 with c=2
    val t = SetSim.Temperature; val s = SetSim.TxtScale
    def lse(xs: Seq[Double]): Double = {
      val m = xs.max; m + math.log(xs.map(x => math.exp(x - m)).sum)
    }
    val simM = Array(Array(0.9, 0.1), Array(0.2, 0.8))
    val term1 = simM.map(r => lse(r.map(_ * t * s).toSeq)).sum / (2 * t * s)
    val term2 = (0 until 2).map(j =>
      lse(simM.map(r => r(j) * t).toSeq)).sum / (2 * t)
    val exp = (term1 + term2) / SetSim.Denominator
    assert(math.abs(got - exp) < 1e-9)
  }

  test("chamferScore expression == aggregator rerank, bit parity on top-k") {
    import graft.queries.VectorQueries
    import graft.queries.VectorQueries.{C, K}
    // the SQL-facing set expression must reproduce the oracle-checked
    // relational aggregator path exactly — same top-k ids, same
    // round9->round6 scores — or the routed flagship's "exact rescore"
    // claim is hollow
    val oracle = VectorQueries.queries("a1_smooth_chamfer_topk")(spark, sfDir)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(2), r.getDouble(3))).toSet).toMap
    val e = Tables.embeddings(spark, sfDir)
    val sets = e.select((col("vec_id") / C).cast("long").as("dset_id"),
        (col("vec_id") % C).cast("int").as("d_sub"), col("embedding"))
      .groupBy("dset_id")
      .agg(transform(
        array_sort(collect_list(struct(col("d_sub"), col("embedding")))),
        x => x.getField("embedding")).as("vec_set")).cache()
    oracle.keys.toSeq.sorted.foreach { qsetId =>
      val qset = e.filter(col("vec_id") >= qsetId * C &&
          col("vec_id") < (qsetId + 1) * C)
        .orderBy("vec_id").select("embedding").collect()
        .map(_.getSeq[Float](0))
      val got = sets.select(col("dset_id"),
          round(round(chamferScore(typedlit(qset.map(_.toSeq).toSeq),
            col("vec_set")), 9), 6).as("score"))
        .orderBy(col("score").desc, col("dset_id").asc).limit(K)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got === oracle(qsetId),
        s"qset $qsetId: expression top-k diverged from the aggregator")
    }
  }

  test("maxSimScore expression == aggregator rerank, bit parity on top-k") {
    import graft.queries.VectorQueries
    import graft.queries.VectorQueries.{C, K}
    // same contract as the chamfer parity above, for the A2 scorer: the
    // fused graft_maxsim_score must reproduce the oracle-checked
    // MaxSimAggregator ranking exactly, or the routed maxsim rescore
    // isn't "the query's own expression"
    val oracle = VectorQueries.queries("a2_maxsim_topk")(spark, sfDir)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(2), r.getDouble(3))).toSet).toMap
    val e = Tables.embeddings(spark, sfDir)
    val sets = e.select((col("vec_id") / C).cast("long").as("dset_id"),
        (col("vec_id") % C).cast("int").as("d_sub"), col("embedding"))
      .groupBy("dset_id")
      .agg(transform(
        array_sort(collect_list(struct(col("d_sub"), col("embedding")))),
        x => x.getField("embedding")).as("vec_set")).cache()
    oracle.keys.toSeq.sorted.foreach { qsetId =>
      val qset = e.filter(col("vec_id") >= qsetId * C &&
          col("vec_id") < (qsetId + 1) * C)
        .orderBy("vec_id").select("embedding").collect()
        .map(_.getSeq[Float](0))
      val got = sets.select(col("dset_id"),
          round(round(maxSimScore(typedlit(qset.map(_.toSeq).toSeq),
            col("vec_set")), 9), 6).as("score"))
        .orderBy(col("score").desc, col("dset_id").asc).limit(K)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got === oracle(qsetId),
        s"qset $qsetId: maxsim expression top-k diverged from the aggregator")
    }
  }

  test("maxSim matches scalar") {
    val sims = Seq(
      (0L, 0L, 0, 0, 0.9), (0L, 0L, 0, 1, 0.1),
      (0L, 0L, 1, 0, 0.2), (0L, 0L, 1, 1, 0.8))
      .toDF("qset_id", "dset_id", "q_sub", "d_sub", "sim")
    val got = SetSim.maxSim(sims).head.getAs[Double]("score")
    assert(math.abs(got - (0.9 + 0.8)) < 1e-12)
  }
}
