package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{VecChamferExpr, VecCosineExpr, VecDotExpr, VecL2SqExpr, VecMaxSimExpr, VecNormExpr}

/** SQL-surface registration of the native vector expressions, so
  * `spark.sql("SELECT graft_vec_dot(a, b) ...")` works — as a
  * [[SparkSessionExtensions]] injector (`spark.sql.extensions=
  * graft.functions.GraftExtensions`) or via [[GraftFunctions.register]]
  * on a live session. Same codegen expressions as the Column API.
  */
object GraftFunctions {

  private def binary(name: String, f: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[VecDotExpr].getName, name),
      { args =>
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        f(args(0), args(1))
      })

  private def unary(name: String, f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[VecNormExpr].getName, name),
      { args =>
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        f(args(0))
      })

  val injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      binary("graft_vec_dot", VecDotExpr.apply),
      binary("graft_vec_l2sq", VecL2SqExpr.apply),
      binary("graft_vec_cosine", VecCosineExpr.apply),
      binary("graft_chamfer_score", VecChamferExpr.apply),
      binary("graft_maxsim_score", VecMaxSimExpr.apply),
      unary("graft_vec_norm", VecNormExpr.apply))

  /** Runtime registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    injections.foreach { case (ident, _, builder) =>
      registry.createOrReplaceTempFunction(ident.funcName, builder, "scala_udf")
    }
  }
}

/** `spark.sql.extensions` entry point: SQL functions + the opt-in ANN
  * top-k rewrite (rule + strategy; inert until
  * `spark.graft.ann.rewrite=true` AND an index is registered). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.AnnTopKRule)
    ext.injectPlannerStrategy(_ => graft.plans.AnnStrategy)
  }
}
