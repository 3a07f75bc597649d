package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** The native codegen expressions must be BIT-identical to the HOF spec
  * forms (same promotion, same sequential fold), interpreted and codegen. */
class NativeExprSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val pairs = {
    val e = Tables.embeddings(spark, sfDir)
    val a = e.filter(col("vec_id") < 30)
      .select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.filter(col("vec_id") >= 30 && col("vec_id") < 60)
      .select(col("vec_id").as("ib"), col("embedding").as("vb"))
    a.crossJoin(b)
  }

  test("vecDot native == HOF, bit-identical") {
    val diff = pairs.select(
        (vecDot(col("va"), col("vb")) - vecDotHof(col("va"), col("vb"))).as("d"))
      .agg(sum(when(col("d") =!= 0.0, 1).otherwise(0))).first().getLong(0)
    assert(diff === 0L)
  }

  test("vecL2Sq native == HOF, bit-identical") {
    val diff = pairs.select(
        (vecL2Sq(col("va"), col("vb")) - vecL2SqHof(col("va"), col("vb"))).as("d"))
      .agg(sum(when(col("d") =!= 0.0, 1).otherwise(0))).first().getLong(0)
    assert(diff === 0L)
  }

  test("vecCosine native == composed dot/(norm*norm), bit-identical") {
    // the composed form is what the DuckDB oracle computes
    // (list_dot / (norm * norm)) and what pre-cosine-expression code
    // spelled out — the fused loop must not drift by even one ulp
    val composed = vecDotHof(col("va"), col("vb")) /
      (vecNormHof(col("va")) * vecNormHof(col("vb")))
    val diff = pairs.select(
        (vecCosine(col("va"), col("vb")) - composed).as("d"))
      .agg(sum(when(col("d") =!= 0.0, 1).otherwise(0))).first().getLong(0)
    assert(diff === 0L)
  }

  test("vecNorm native == HOF, bit-identical") {
    val diff = Tables.embeddings(spark, sfDir)
      .select((vecNorm(col("embedding")) - vecNormHof(col("embedding"))).as("d"))
      .agg(sum(when(col("d") =!= 0.0, 1).otherwise(0))).first().getLong(0)
    assert(diff === 0L)
  }

  test("vecLshBands packs sign bits into band keys, codegen == HOF spec") {
    import graft.operators.LshAnn
    val dim = 64
    val planesFlat = LshAnn.planes(16, dim, seed = 42L).flatten.toArray
    val e = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
    val planesLit = typedLit(LshAnn.planes(16, dim, seed = 42L))
    // HOF spec: per-plane interpreted dot, bits packed via arithmetic
    val bitsHof = transform(planesLit, p =>
      when(vecDotHof(p, col("embedding")) >= 0, 1L).otherwise(0L))
    val keyHof = (b: Int) => (0 until 8).map(r =>
      element_at(bitsHof, b * 8 + r + 1) * lit(1L << (7 - r))
    ).reduce(_ + _)
    val rows = e.select(col("vec_id"),
        vecLshBands(col("embedding"), planesFlat, 8).as("native"),
        array(keyHof(0), keyHof(1)).as("spec"))
      .collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      val native = r.getSeq[Long](1)
      val spec = r.getSeq[Long](2)
      assert(native.length === 2)
      assert(native === spec, s"vec_id=${r.getLong(0)}")
    }
  }

  test("native expressions stay inside whole-stage codegen") {
    val df = pairs.select(vecDot(col("va"), col("vb")).as("dot"))
    df.collect() // AQE finalizes the physical plan only on execution
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators print with the "*(stageId)" prefix; the Project
    // holding vecdotexpr must carry it
    assert(plan.linesIterator.exists(l =>
      l.contains("vecdotexpr") && l.contains("*(")), s"no codegen span:\n$plan")
  }
}
