package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two ArrayType(DoubleType) columns.
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * materializes an intermediate product array per row pair — at millions of
  * candidate pairs × 64 dims that allocation dominates the ANN/near-dup
  * runtime. This expression fuses the loop into whole-stage codegen: no
  * intermediate array, primitive accumulation, and the same left-to-right
  * summation order (bit-identical results to the zip_with form, which the
  * q19/q43 DuckDB oracles rely on).
  *
  * Null semantics: null input array → null; array elements are assumed
  * non-null (dense embedding vectors). Callers cast float arrays to double
  * explicitly — no implicit coercion is provided.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Register `graft_dot` on the session's function registry (idempotent).
    * This is the supported hook for wiring a catalyst Expression into both
    * the SQL surface and `call_function`. */
  def ensureRegistered(spark: SparkSession): Unit = spark match {
    case cs: org.apache.spark.sql.classic.SparkSession =>
      cs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    case _ => // non-classic session: SQL surface unavailable, Column API still fine
  }

  /** Column-API surface for [[DotProduct]]. Requires the active session
    * (registers the function on first use). */
  def dot(spark: SparkSession)(a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_dot", a, b)
  }

  /** Squared L2 norm via the same fused loop. */
  def normSq(spark: SparkSession)(a: Column): Column = dot(spark)(a, a)
}
