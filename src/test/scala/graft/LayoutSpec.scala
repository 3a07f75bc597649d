package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Plan-shape tests for the physical-layout utilities: bucketed joins
  * must not exchange on the bucket key; salted joins must produce the
  * same rows as the plain join. */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles.foreach(rmrf)
    p.delete()
  }

  test("bucketed co-located join has no Exchange on the bucket key") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previously-failed run can leave the managed location behind
    Seq("b_orders", "b_lineitem").foreach { t =>
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists) rmrf(loc)
    }
    Layout.writeBucketed(Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice"), "b_orders", 4, Seq("o_orderkey"))
    Layout.writeBucketed(Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity"), "b_lineitem", 4, Seq("l_orderkey"))
    // force the sort-merge path so bucketing (not broadcast) is what
    // avoids the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join returns identical rows to the plain join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"), sum("o_totalprice").as("p"))
      .orderBy("l_orderkey").collect()
    val salted = Layout.saltedJoin(li, o, "l_orderkey", saltFactor = 4)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"), sum("o_totalprice").as("p"))
      .orderBy("l_orderkey").collect()
    assert(plain.length === salted.length)
    plain.zip(salted).foreach { case (a, b) => assert(a === b) }
  }
}
