package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot vector kernels — the codegen
  * tier of SURVEY §7.4's ledger (the reference's AVX-512 kernels,
  * `/root/reference/include/efanna2e/distance.h:21-225`).
  *
  * The HOF forms in [[graft.functions.VectorFunctions]] allocate an
  * intermediate array per pair (`zip_with`) before folding; these emit a
  * single fused loop over the two `ArrayData`s — same arithmetic, same
  * float→double promotion, same sequential accumulation order, so results
  * are bit-identical to the HOF/oracle forms, but with zero per-row
  * allocation and full whole-stage-codegen fusion.
  */
private[expressions] trait VecElemType { self: Expression =>
  protected def elemType(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }

  /** Java accessor snippet for element i of an ArrayData of `et`. */
  protected def getter(et: DataType, arr: String, i: String): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other => throw new IllegalArgumentException(s"unsupported element $other")
  }

  protected def getElem(et: DataType, arr: ArrayData, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case other => throw new IllegalArgumentException(s"unsupported element $other")
  }

  /** Fail loudly on ragged input — same contract as VectorStore's
    * "ragged dim" require; silent truncation would diverge from the HOF
    * forms exactly on malformed data. */
  protected def checkSameLength(op: String, a: Int, b: Int): Unit =
    if (a != b) throw new IllegalArgumentException(
      s"$op: vector dimension mismatch ($a vs $b)")

  /** Codegen twin of [[checkSameLength]]. */
  protected def lengthGuard(op: String, a: String, b: String): String =
    s"""if ($a.numElements() != $b.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$op: vector dimension mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
       |}""".stripMargin
}

/** Σ aᵢ·bᵢ with double accumulation (`distance.h:91-225`, un-negated). */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with VecElemType {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val etL = elemType(left.dataType)
    val etR = elemType(right.dataType)
    checkSameLength("graft_vec_dot", x.numElements(), y.numElements())
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += getElem(etL, x, i) * getElem(etR, y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val etL = elemType(left.dataType)
    val etR = elemType(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |${lengthGuard("graft_vec_dot", a, b)}
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(etL, a, i)} * ${getter(etR, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotExpr =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² with double accumulation (`distance.h:21-89`). */
case class VecL2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression with VecElemType {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val etL = elemType(left.dataType)
    val etR = elemType(right.dataType)
    checkSameLength("graft_vec_l2sq", x.numElements(), y.numElements())
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = getElem(etL, x, i) - getElem(etR, y, i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val etL = elemType(left.dataType)
    val etR = elemType(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |${lengthGuard("graft_vec_l2sq", a, b)}
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(etL, a, i)} - ${getter(etR, b, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2SqExpr =
    copy(left = l, right = r)
}

/** ‖a‖₂ = sqrt(Σ aᵢ²) (`distance.h:226-321`'s norm cache kernel). */
case class VecNormExpr(child: Expression)
    extends UnaryExpression with VecElemType {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val et = elemType(child.dataType)
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = getElem(et, x, i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = elemType(child.dataType)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${getter(et, a, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): VecNormExpr =
    copy(child = c)
}
