package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TitleStandardizer

/** `standardize_title` as a native Catalyst expression (SURVEY §7.2's
  * optional custom-Expression step): whole-stage codegen emits a direct
  * static call into the matcher, skipping the ScalaUDF wrapper's
  * per-row encoder round-trip. Semantics are identical to the UDF — both
  * call [[TitleStandardizer.standardize]], whose index lives once per
  * executor JVM (classpath-resource dictionary, no broadcast needed).
  */
case class StandardizeTitleExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "standardize_title"

  /** Deterministic pure function of its input ⇒ a literal argument lets
    * Catalyst's ConstantFolding evaluate the lookup ONCE at optimization
    * time — `standardize_title('poet')` reaches the executors as a plain
    * string literal, not a per-row call (plan-asserted in
    * GraftExtensionsSpec). */
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TitleStandardizer.standardize(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TitleStandardizer.standardize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): StandardizeTitleExpr =
    copy(child = newChild)
}

object StandardizeTitleExpr {
  /** Register the native expression under the reference's function name —
    * SQL and `call_function` both resolve to the codegen'd path. */
  def ensureRegistered(spark: SparkSession): Unit = spark match {
    case cs: org.apache.spark.sql.classic.SparkSession =>
      cs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "standardize_title", exprs => StandardizeTitleExpr(exprs.head), "built-in")
    case _ =>
  }
}
