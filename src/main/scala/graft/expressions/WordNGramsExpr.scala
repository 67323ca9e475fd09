package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-grams over an array<string> token column: element i of
  * the result is tokens[i..i+n-1] joined by a single space; fewer than n
  * tokens yields an empty array; null tokens column yields null.
  *
  * The composable alternative (`transform(sequence(...), i =>
  * concat_ws(" ", element_at(ts, i), ...))` — see the previous
  * [[graft.operators.CorpusFilters.wordNGrams]] body) is a higher-order
  * function, which Spark evaluates INTERPRETED: per gram it pays n
  * `element_at` expression evals plus lambda-variable binding, outside
  * whole-stage codegen. This expression fetches each token once and emits
  * a tight fused loop — the gram hot path of the Gopher rule battery,
  * chunk/substring dedup, contamination scan, and bigram LM (q65–q67,
  * q133, q134).
  *
  * Bit-parity with the HOF form is pinned by `WordNGramsExprSpec` (same
  * grams on random corpora, interpreted eval ≡ codegen ≡ old lambda
  * formulation), so every DuckDB oracle that was green against the old
  * expression stays green against this one.
  */
case class WordNGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!arrOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal int gram width")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName width must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Gram width; right is foldable by contract. */
  private lazy val n: Int = right.eval().asInstanceOf[Int]

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(tokens: Any, @annotation.unused width: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m = if (len < n) 0 else len - n + 1
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val grams = new Array[Any](m)
    i = 0
    while (i < m) {
      grams(i) = UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      i += 1
    }
    new GenericArrayData(grams)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
    val u8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val toks = ctx.freshName("toks")
      val grams = ctx.freshName("grams")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      // NOTE: no java.util.Arrays.copyOfRange here — it is a GENERIC
      // method, and janino (Spark's codegen compiler) erases it to
      // Object[], which cannot bind to concatWs(UTF8String,
      // UTF8String...): the stage would silently fall back to
      // interpreted execution (caught by WordNGramsExprSpec's
      // CODEGEN_ONLY test). Build the window array explicitly instead.
      s"""
         |final int $len = $a.numElements();
         |final int $m = $len < $n ? 0 : $len - $n + 1;
         |final $u8[] $toks = new $u8[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  $toks[$i] = $a.getUTF8String($i);
         |}
         |final $u8[] $grams = new $u8[$m];
         |final $u8[] $parts = new $u8[$n];
         |for (int $i = 0; $i < $m; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $toks[$i + $j];
         |  }
         |  $grams[$i] = $u8.concatWs($sepRef, $parts);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($grams);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNGrams =
    copy(left = newLeft, right = newRight)
}

object WordNGramsExpr {

  /** Register `graft_ngrams` on the session's function registry
    * (idempotent) — same wiring pattern as [[VectorExpressions]]. */
  def ensureRegistered(spark: SparkSession): Unit = spark match {
    case cs: org.apache.spark.sql.classic.SparkSession =>
      cs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_ngrams", exprs => WordNGrams(exprs.head, exprs(1)), "built-in")
    case _ => // non-classic session: SQL surface unavailable, Column API still fine
  }
}
