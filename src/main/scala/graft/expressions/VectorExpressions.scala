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

/** Codegen'd asymmetric dot product against an SQ8-quantized vector
  * (faiss-style per-dimension affine scalar quantization): the query
  * stays float64, the corpus vector is ONE BYTE per dimension plus the
  * shared per-dimension (mins, steps) parameter arrays, reconstructed
  * on the fly as `mins[i] + (codes[i] & 0xFF) * steps[i]` — 8× less
  * index memory/IO than array<double> cells at probe time, which is
  * the lever that keeps a 100 TB vector corpus servable. Summation is
  * left-to-right IEEE like [[DotProduct]], so the SQ8 probe is exactly
  * mirrorable (no float tolerance in its oracle).
  *
  * Null semantics: any null input → null; parameter arrays are dense.
  */
case class Sq8Dot(q: Expression, codes: Expression,
    mins: Expression, steps: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = q
  override def second: Expression = codes
  override def third: Expression = mins
  override def fourth: Expression = steps
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (arr(q.dataType) &&
        codes.dataType == org.apache.spark.sql.types.BinaryType &&
        arr(mins.dataType) && arr(steps.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, binary, array<double>, " +
        s"array<double>), got ${q.dataType.simpleString}, " +
        s"${codes.dataType.simpleString}, ${mins.dataType.simpleString}, " +
        s"${steps.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val qv = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[Array[Byte]]
    val mn = c.asInstanceOf[ArrayData]
    val st = d.asInstanceOf[ArrayData]
    val n = math.min(math.min(qv.numElements(), cs.length),
      math.min(mn.numElements(), st.numElements()))
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += qv.getDouble(i) * (mn.getDouble(i) + (cs(i) & 0xFF) * st.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min(
         |  java.lang.Math.min($a.numElements(), $b.length),
         |  java.lang.Math.min($c.numElements(), $d.numElements()));
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) *
         |    ($c.getDouble($i) + (($b[$i]) & 0xFF) * $d.getDouble($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Sq8Dot =
    copy(q = newFirst, codes = newSecond, mins = newThird, steps = newFourth)
}

/** Squared L2 norm of an SQ8-reconstructed vector (see [[Sq8Dot]]) —
  * the probe divides by sqrt of this, so cosine is computed against the
  * EXACT reconstruction both engines and the mirror share. */
case class Sq8NormSq(codes: Expression, mins: Expression, steps: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = mins
  override def third: Expression = steps
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_normsq"

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (codes.dataType == org.apache.spark.sql.types.BinaryType &&
        arr(mins.dataType) && arr(steps.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, array<double>, array<double>), " +
        s"got ${codes.dataType.simpleString}, ${mins.dataType.simpleString}, " +
        s"${steps.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val cs = a.asInstanceOf[Array[Byte]]
    val mn = b.asInstanceOf[ArrayData]
    val st = c.asInstanceOf[ArrayData]
    val n = math.min(cs.length, math.min(mn.numElements(), st.numElements()))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val r = mn.getDouble(i) + (cs(i) & 0xFF) * st.getDouble(i)
      acc += r * r
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val r = ctx.freshName("r")
      s"""
         |final int $n = java.lang.Math.min($a.length,
         |  java.lang.Math.min($b.numElements(), $c.numElements()));
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $r = $b.getDouble($i) + (($a[$i]) & 0xFF) * $c.getDouble($i);
         |  $acc += $r * $r;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Sq8NormSq =
    copy(codes = newFirst, mins = newSecond, steps = newThird)
}

object VectorExpressions {

  /** Register `graft_dot` on the session's function registry (idempotent).
    * This is the supported hook for wiring a catalyst Expression into both
    * the SQL surface and `call_function`. */
  def ensureRegistered(spark: SparkSession): Unit = spark match {
    case cs: org.apache.spark.sql.classic.SparkSession =>
      cs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
      cs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_sq8_dot",
        exprs => Sq8Dot(exprs.head, exprs(1), exprs(2), exprs(3)), "built-in")
      cs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_sq8_normsq",
        exprs => Sq8NormSq(exprs.head, exprs(1), exprs(2)), "built-in")
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

  /** Column-API surface for [[Sq8Dot]] (query float64 × SQ8 codes). */
  def sq8Dot(spark: SparkSession)(q: Column, codes: Column,
      mins: Column, steps: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_sq8_dot", q, codes, mins, steps)
  }

  /** Column-API surface for [[Sq8NormSq]]. */
  def sq8NormSq(spark: SparkSession)(codes: Column,
      mins: Column, steps: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_sq8_normsq", codes, mins, steps)
  }
}
