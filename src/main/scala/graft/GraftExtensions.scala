package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.DotProduct

/** Session-extension entry point — the Spark analog of the reference
  * extension's install hook (`/root/reference/src/lib.rs:80-87`): start a
  * session with `spark.sql.extensions=graft.GraftExtensions` and the
  * engine's native expressions resolve in SQL without any imperative
  * registration call. (The UDF surface still registers through
  * `GraftFunctions.register`, which is also invoked lazily by the
  * operators that need it.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[graft.expressions.WordNGrams].getName,
        "graft_ngrams"),
      (exprs: Seq[Expression]) => graft.expressions.WordNGrams(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[graft.expressions.WordTokens].getName,
        "graft_tokens"),
      (exprs: Seq[Expression]) => graft.expressions.WordTokens(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("standardize_title"),
      new ExpressionInfo(classOf[graft.expressions.StandardizeTitleExpr].getName,
        "standardize_title"),
      (exprs: Seq[Expression]) => graft.expressions.StandardizeTitleExpr(exprs.head)))
  }
}
