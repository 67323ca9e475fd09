package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.CorpusFilters

/** Pins the codegen'd [[graft.expressions.WordNGrams]] to the
  * higher-order-function formulation it replaced: identical grams on
  * random and edge-case corpora, interpreted eval ≡ codegen, and the
  * documented null/short-input contract. Every DuckDB gram oracle
  * (q65–q67, q133, q134) rides on this equivalence. */
class WordNGramsExprSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  /** The pre-round-7 lambda formulation, kept verbatim as the reference. */
  private def hofNGrams(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(ts) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ts, i + lit(k))): _*)))

  test("matches the lambda formulation on random corpora for n in 1..4") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = Vector("a", "bb", "ccc", "d", "e", "longertoken")
    val docs = (0L until 200L).map { i =>
      i -> Vector.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
      .select($"doc_id", CorpusFilters.words($"text").as("ts"))
    for (n <- 1 to 4) {
      val both = df.select($"doc_id",
        CorpusFilters.wordNGrams($"ts", n).as("fast"),
        hofNGrams($"ts", n).as("ref"))
      val diff = both.filter(not($"fast" <=> $"ref")).count()
      assert(diff == 0, s"n=$n: $diff rows diverge from the HOF formulation")
    }
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val df = Seq("x y z w", "x", "", "x y").toDF("text")
      .select(CorpusFilters.words($"text").as("ts"))
    val expr = CorpusFilters.wordNGrams($"ts", 2)
    val viaCodegen = df.select(expr.as("g")).collect().map(_.getSeq[String](0)).toSeq
    // force the interpreted path through a non-codegen context: eval on
    // the expression directly
    val resolved = df.select(expr.as("g")).queryExecution.analyzed
    val bound = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(resolved.expressions.head, resolved.children.head.output)
    val rows = df.select($"ts").queryExecution.toRdd.collect()
    val viaEval = rows.map { r =>
      val out = bound.eval(r)
      if (out == null) null
      else {
        val ad = out.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
      }
    }.toSeq
    assert(viaEval == viaCodegen)
  }

  test("null tokens column yields null; short and empty docs yield empty") {
    import spark.implicits._
    val df = Seq((0L, Some("x y")), (1L, None), (2L, Some(""))).toDF("id", "text")
      .select($"id", when($"text".isNotNull, CorpusFilters.words($"text")).as("ts"))
    val out = df.select($"id", CorpusFilters.wordNGrams($"ts", 3).as("g"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(0L).get.asInstanceOf[scala.collection.Seq[_]].isEmpty)
    assert(out(1L).isEmpty)
    assert(out(2L).get.asInstanceOf[scala.collection.Seq[_]].isEmpty)
  }

  test("resolves in SQL through the session extension registry") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_ngrams(array('a','b','c'), 2) AS g").head().getSeq[String](0)
    assert(got == Seq("a b", "b c"))
  }
}
