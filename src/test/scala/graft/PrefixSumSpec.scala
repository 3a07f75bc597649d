package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrefixSum

/** The recursive bounded-window prefix sum behind pack_sequences: every
  * decomposition depth must reproduce the single-global-window exclusive
  * prefix exactly, including over sparse (gappy) bucket keys. */
class PrefixSumSpec extends AnyFunSuite {
  import TestSpark._

  private def reference(totals: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    totals.withColumn("boff", coalesce(sum("total").over(w), lit(0L)))
      .select(col("bucket"), col("boff"))
  }

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit = {
    val l = a.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val r = b.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(l.toSeq === r.toSeq)
  }

  test("two-level recursion with tiny fanout equals the global window") {
    // 10k buckets, fanout 10, levels 2: within-group windows span <=10
    // rows, the top table still has 100 rows — real recursion at every
    // level, not a degenerate base-case pass
    val totals = spark.range(10000).select(col("id").as("bucket"),
      pmod(xxhash64(col("id")), lit(97)).as("total"))
    assertSame(
      PrefixSum.exclusiveOffsets(totals, "bucket", "total",
        fanout = 10, levels = 2),
      reference(totals))
  }

  test("sparse bucket ids (gaps) and deep recursion stay exact") {
    // buckets 7·id + id%5: gappy, non-contiguous — the monotone-key
    // argument must not silently assume dense ids
    val totals = spark.range(3000).select(
      (col("id") * 7 + pmod(col("id"), lit(5))).as("bucket"),
      (pmod(xxhash64(col("id")), lit(1000)) + 1).as("total"))
    assertSame(
      PrefixSum.exclusiveOffsets(totals, "bucket", "total",
        fanout = 4, levels = 4),
      reference(totals))
  }

  test("levels=0 is the single bounded global window") {
    val totals = spark.range(50).select(col("id").as("bucket"),
      lit(3L).as("total"))
    assertSame(
      PrefixSum.exclusiveOffsets(totals, "bucket", "total", levels = 0),
      reference(totals))
  }

  test("pack_sequences (levels=2 path) still matches the naive global cumsum") {
    import graft.queries.TextQueries
    val packed = TextQueries.queries("pack_sequences")(spark, sfDir)
      .select("doc_id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val docsDf = TextQueries.queries("pack_sequences")(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"))
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docsDf
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"),
        expr("(cum - n_tokens) div 512").as("seq_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(packed.toSeq === naive.toSeq)
  }
}
