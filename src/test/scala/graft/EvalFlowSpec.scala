package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Recall
import graft.queries.{EvalQueries, VectorQueries}
import graft.sources.Sinks

/** End-to-end GT pipeline: W3 full ranking → S13 GT writer → S4 load →
  * J3 recall join — the reference's gen-GT-then-evaluate loop
  * (`gen_vector_groundtruth` + `RecallCalculator`), plus plan guards for
  * the rerank chain. */
class EvalFlowSpec extends AnyFunSuite {
  import TestSpark._

  test("W3 ranking -> GT sink -> load -> Recall.atK == 1.0 against itself") {
    val ranked = VectorQueries.queries("w3_full_ranking")(spark, sfDir)
      .select(col("qset_id").as("query_id"), col("rank"),
        col("dset_id").as("id"))
    val path = "/tmp/graft_eval_flow_gt"
    Sinks.writeSetGt(ranked, path)
    val gt = Sinks.readSetGt(spark, path)
    // evaluating the GT against itself must give recall exactly 1.0
    val res = gt.select(col("query_id"), col("gt_ids").as("ids"))
    val recalls = Recall.atK(res, gt, 10).collect()
    assert(recalls.length === 5)
    recalls.foreach(r => assert(r.getDouble(1) === 1.0))
    // and against the MaxSim system ranking it matches j3's output
    val a2ids = VectorQueries.queries("a2_maxsim_topk")(spark, sfDir)
      .groupBy(col("qset_id").as("query_id"))
      .agg(transform(array_sort(collect_list(struct(col("rank"), col("dset_id")))),
        x => x.getField("dset_id")).as("ids"))
    val viaAtK = Recall.atK(a2ids, gt, 10).collect()
      .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e6) / 1e6)).toMap
    val viaJ3 = EvalQueries.queries("j3_recall_at_k")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaAtK === viaJ3)
  }

  test("a1 rerank plan: no cartesian product, bounded exchanges") {
    val df = VectorQueries.queries("a1_smooth_chamfer_topk")(spark, sfDir)
    df.collect()
    // AQE's toString prints Final AND Initial sections — audit Final only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 2, s"$shuffles shuffles in a1 chain:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"), "query side not broadcast")
  }
}
