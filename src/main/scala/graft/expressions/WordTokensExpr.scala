package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd corpus tokenizer: lowercased whitespace tokens with empties
  * dropped — exactly `filter(split(lower(text), "\\s+"), t => t =!= "")`,
  * fused into one expression.
  *
  * Parity is by CONSTRUCTION, not reimplementation: eval delegates to the
  * same `UTF8String.toLowerCase()` and `UTF8String.split(pattern, -1)`
  * methods the `Lower` and `StringSplit` builtins call, then drops
  * zero-byte tokens — so every oracle that was green against the composed
  * form stays green (additionally pinned by `WordTokensExprSpec`). What
  * the fusion buys: the `filter` higher-order function is interpreted
  * (outside whole-stage codegen) and materializes an intermediate array;
  * this runs the whole tokenize step inside the codegen span with one
  * output allocation. Used by [[graft.operators.CorpusFilters.words]] —
  * the entry of every corpus-hygiene, dedup, and LM operator.
  */
case class WordTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  private val ws = UTF8String.fromString("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val parts = input.asInstanceOf[UTF8String].toLowerCase.split(ws, -1)
    var cnt = 0
    var i = 0
    while (i < parts.length) { if (parts(i).numBytes() > 0) cnt += 1; i += 1 }
    val out = new Array[Any](cnt)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) { out(j) = parts(i); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wsRef = ctx.addReferenceObj("ws", ws, classOf[UTF8String].getName)
    val u8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, a => {
      val parts = ctx.freshName("parts")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |final $u8[] $parts = $a.toLowerCase().split($wsRef, -1);
         |int $cnt = 0;
         |for (int $i = 0; $i < $parts.length; $i++) {
         |  if ($parts[$i].numBytes() > 0) $cnt++;
         |}
         |final $u8[] $out = new $u8[$cnt];
         |int $j = 0;
         |for (int $i = 0; $i < $parts.length; $i++) {
         |  if ($parts[$i].numBytes() > 0) { $out[$j] = $parts[$i]; $j++; }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)
}

object WordTokensExpr {

  /** Register `graft_tokens` on the session's function registry
    * (idempotent) — same wiring pattern as [[VectorExpressions]]. */
  def ensureRegistered(spark: SparkSession): Unit = spark match {
    case cs: org.apache.spark.sql.classic.SparkSession =>
      cs.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_tokens", exprs => WordTokens(exprs.head), "built-in")
    case _ => // non-classic session: SQL surface unavailable, Column API still fine
  }
}
