package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{BeamSearch, GraphBuild}
import graft.operators.{Recall, Rerank, SetSim, TopK}
import graft.queries.{IndexQueries, VectorQueries}
import graft.sources.Sinks

/** M5 — experiment harness parity: the reference's budget-sweep runner
  * (`scripts/roargraph/run_roargraph_search_multivector_rerank_expr.sh`:
  * for each beam budget, search + rerank, then report
  * (budget, recall, QPS) — `test_search_multivector_rerank.cpp:341-347`).
  *
  * Usage: `runMain graft.Sweep [sfDir] [budgets-csv] [outDir]` —
  * defaults: sf0.01 fixtures, budgets 40,80,120,200, stdout TSV only.
  * With outDir set, per-budget rows land as an S12 TSV sink.
  */
object Sweep {
  import VectorQueries.{C, NQ, K}

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val budgets = args.lift(1).getOrElse("40,80,120,200")
      .split(",").map(_.trim.toInt).toSeq
    val outDir = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = run(spark, sfDir, budgets)
    println("budget\trecall\tqps\tsearch_sec")
    rows.foreach { case (b, r, q, t) => println(f"$b\t$r%.4f\t$q%.1f\t$t%.3f") }
    outDir.foreach { dir =>
      import spark.implicits._
      Sinks.writeTsv(rows.toDF("budget", "recall", "qps", "search_sec"), dir)
    }
    spark.stop()
  }

  /** One (budget, Recall@K vs fullscan GT, QPS, wall sec) row per budget. */
  def run(spark: SparkSession, sfDir: String,
          budgets: Seq[Int]): Seq[(Int, Double, Double, Double)] = {
    val emb = Tables.embeddings(spark, sfDir)
    val idx = GraphBuild.build(spark, emb, emb, IndexQueries.FixtureParams)
    val graphB = spark.sparkContext.broadcast(idx.graph)
    val vecsB = spark.sparkContext.broadcast(idx.vecs)
    val querySets = emb.filter(col("vec_id") < NQ * C).select(
      (col("vec_id") / C).cast("long").as("qset_id"),
      (col("vec_id") % C).cast("int").as("q_sub"),
      col("embedding").as("q_vec"))

    // fullscan chamfer GT (W3 role)
    val gt = VectorQueries.queries("a1_smooth_chamfer_topk")(spark, sfDir)
      .groupBy(col("qset_id").as("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("rank"), col("dset_id")))),
        x => x.getField("dset_id")).as("gt_ids"))
      .cache()
    gt.count()

    budgets.map { budget =>
      val t0 = System.nanoTime()
      val cands = BeamSearch.searchMultiDf(spark, querySets, graphB, vecsB,
        idx.params.metric, minPq = math.min(10, budget / C),
        maxPq = math.max(budget * 2, 32), budget = budget, adaptive = true)
      val reranked = Rerank.chamferTopK(emb, querySets,
        cands.select(col("qset_id"), col("d_id")), C, K)
      val res = reranked.groupBy(col("qset_id").as("query_id"))
        .agg(transform(array_sort(collect_list(struct(col("rank"), col("dset_id")))),
          x => x.getField("dset_id")).as("ids"))
      val recalls = Recall.atK(res, gt, K).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = recalls.map(_.getDouble(1)).sum / recalls.length
      val qps = recalls.length / dt
      (budget, recall, qps, dt)
    }
  }
}
