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
  * raw index memory/IO than array<double> cells at probe time.
  * Summation is left-to-right IEEE like [[DotProduct]], so the SQ8
  * probe is exactly mirrorable (no float tolerance in its oracle).
  *
  * The parameter arrays are CONSTRUCTOR FIELDS, not child expressions:
  * they are per-index constants (dim-sized, collected once per probe),
  * and codegen binds them as plain `double[]` reference objects — two
  * raw array loads per dimension instead of two `ArrayData.getDouble`
  * calls on literal columns. Honest measurement note: on a WARM page
  * cache the probe is join/window-bound, so this (and the byte decode
  * itself) doesn't move local wall-clock at 64 dims — the expression's
  * value there is the 8× smaller scan footprint, which matters for
  * cold object-storage reads and cache capacity, not hot-cache CPU
  * (SCALE.md §SQ8 carries the full band).
  *
  * Null semantics: null query/codes → null; parameter arrays are dense.
  */
case class Sq8Dot(q: Expression, codes: Expression,
    mins: Array[Double], steps: Array[Double])
  extends BinaryExpression {

  override def left: Expression = q
  override def right: Expression = codes
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    if ((q.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }) && codes.dataType == org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, binary) children, got " +
        s"${q.dataType.simpleString} and ${codes.dataType.simpleString}")
  }

  // Dimension drift between codes and params (stale qparams after a
  // rebuild with different dims, truncated codes) must surface as an
  // ERROR, never as a silently-truncated — plausible but wrong — cosine
  // score (r14 ADVICE; the IvfMirror throws on the same mismatch, so
  // truncating here would also desync the bit-exact oracle posture).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val qv = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[Array[Byte]]
    val n = qv.numElements()
    if (n != cs.length || n != mins.length || n != steps.length)
      throw new IllegalStateException(
        s"$prettyName dimension mismatch: query=$n codes=${cs.length} " +
          s"mins=${mins.length} steps=${steps.length} — the SQ8 codes " +
          "and qparams drifted (re-run quantizeIvfIndex)")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += qv.getDouble(i) * (mins(i) + (cs(i) & 0xFF) * steps(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq8mins", mins, "double[]")
    val stepsRef = ctx.addReferenceObj("sq8steps", steps, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.length || $n != $minsRef.length ||
         |    $n != $stepsRef.length) {
         |  throw new IllegalStateException(
         |    "graft_sq8_dot dimension mismatch: query=" + $n + " codes="
         |    + $b.length + " mins=" + $minsRef.length + " steps="
         |    + $stepsRef.length
         |    + " — the SQ8 codes and qparams drifted (re-run quantizeIvfIndex)");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) *
         |    ($minsRef[$i] + (($b[$i]) & 0xFF) * $stepsRef[$i]);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Dot =
    copy(q = newLeft, codes = newRight)
}

/** Squared L2 norm of an SQ8-reconstructed vector (see [[Sq8Dot]]) —
  * the probe divides by sqrt of this, so cosine is computed against the
  * EXACT reconstruction both engines and the mirror share. */
case class Sq8NormSq(codes: Expression,
    mins: Array[Double], steps: Array[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def child: Expression = codes
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_normsq"

  override def checkInputDataTypes(): TypeCheckResult =
    if (codes.dataType == org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary child, got ${codes.dataType.simpleString}")

  // Same loud-mismatch contract as [[Sq8Dot]]: codes/params drift is an
  // error, never a truncated norm.
  override def nullSafeEval(a: Any): Any = {
    val cs = a.asInstanceOf[Array[Byte]]
    val n = cs.length
    if (n != mins.length || n != steps.length)
      throw new IllegalStateException(
        s"$prettyName dimension mismatch: codes=$n mins=${mins.length} " +
          s"steps=${steps.length} — the SQ8 codes and qparams drifted " +
          "(re-run quantizeIvfIndex)")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val r = mins(i) + (cs(i) & 0xFF) * steps(i)
      acc += r * r
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq8mins", mins, "double[]")
    val stepsRef = ctx.addReferenceObj("sq8steps", steps, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val r = ctx.freshName("r")
      s"""
         |final int $n = $a.length;
         |if ($n != $minsRef.length || $n != $stepsRef.length) {
         |  throw new IllegalStateException(
         |    "graft_sq8_normsq dimension mismatch: codes=" + $n + " mins="
         |    + $minsRef.length + " steps=" + $stepsRef.length
         |    + " — the SQ8 codes and qparams drifted (re-run quantizeIvfIndex)");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $r = $minsRef[$i] + (($a[$i]) & 0xFF) * $stepsRef[$i];
         |  $acc += $r * $r;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8NormSq =
    copy(codes = newChild)
}

object VectorExpressions {

  /** Register `graft_dot` on the session's function registry (idempotent).
    * This is the supported hook for wiring a catalyst Expression into both
    * the SQL surface and `call_function`. */
  def ensureRegistered(spark: SparkSession): Unit = spark match {
    case cs: org.apache.spark.sql.classic.SparkSession =>
      cs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
      // the SQL surface requires LITERAL parameter arrays (the Column
      // API passes them as plain double[] constructor fields)
      def litDoubles(e: Expression, fn: String): Array[Double] = e match {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType.isInstanceOf[ArrayType] =>
          l.value.asInstanceOf[ArrayData].toDoubleArray()
        case other => throw new IllegalArgumentException(
          s"$fn requires a foldable array<double> literal for its " +
            s"quantization params, got ${other.sql}")
      }
      cs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_sq8_dot",
        exprs => Sq8Dot(exprs.head, exprs(1),
          litDoubles(exprs(2), "graft_sq8_dot"),
          litDoubles(exprs(3), "graft_sq8_dot")), "built-in")
      cs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_sq8_normsq",
        exprs => Sq8NormSq(exprs.head,
          litDoubles(exprs(1), "graft_sq8_normsq"),
          litDoubles(exprs(2), "graft_sq8_normsq")), "built-in")
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

  /** Column-API surface for [[Sq8Dot]] (query float64 × SQ8 codes):
    * params bind as raw double[] reference objects in codegen. */
  def sq8Dot(spark: SparkSession)(q: Column, codes: Column,
      mins: Array[Double], steps: Array[Double]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(Sq8Dot(
      org.apache.spark.sql.graft.ColumnBridge.expression(q),
      org.apache.spark.sql.graft.ColumnBridge.expression(codes),
      mins, steps))

  /** Column-API surface for [[Sq8NormSq]]. */
  def sq8NormSq(spark: SparkSession)(codes: Column,
      mins: Array[Double], steps: Array[Double]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(Sq8NormSq(
      org.apache.spark.sql.graft.ColumnBridge.expression(codes),
      mins, steps))
}
