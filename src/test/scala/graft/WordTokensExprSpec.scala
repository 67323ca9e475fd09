package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.CorpusFilters

/** Pins the codegen'd [[graft.expressions.WordTokens]] to the composed
  * `filter(split(lower(text), "\\s+"), _ =!= "")` it replaced. The
  * expression delegates to the same UTF8String methods the builtins use,
  * so equality must be exact — including unicode case mapping, mixed
  * whitespace, and leading/trailing separators. */
class WordTokensExprSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  /** The pre-round-7 composed formulation, kept verbatim as reference. */
  private def composed(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  test("matches the composed formulation on adversarial strings") {
    import spark.implicits._
    val cases = Seq(
      "a b c", "  leading", "trailing   ", "\ttabs\tand\nnewlines\r\n",
      "MIXED Case ÄÖÜ ß İstanbul ΣΙΓΜΑ", "", "   ", "one",
      "double  space", "punct, stays. as-is!", "emoji 🙂 token",
      "ｆｕｌｌｗｉｄｔｈ ＴＥＸＴ", " nbsp is not \\s", "a thin")
    val df = cases.toDF("text")
    val diff = df.select(
        CorpusFilters.words($"text").as("fast"), composed($"text").as("ref"))
      .filter(not($"fast" <=> $"ref")).count()
    assert(diff == 0)
  }

  test("matches on random ascii-printable + whitespace soup") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val alphabet = ('!' to '~').mkString + " \t\n\r \t "
    val docs = (0 until 300).map(_ =>
      Tuple1((0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString))
    val df = docs.toDF("text")
    val diff = df.select(
        CorpusFilters.words($"text").as("fast"), composed($"text").as("ref"))
      .filter(not($"fast" <=> $"ref")).count()
    assert(diff == 0)
  }

  test("null yields null; SQL surface resolves") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val out = Seq((1L, null: String)).toDF("id", "text")
      .select(CorpusFilters.words($"text")).head()
    assert(out.isNullAt(0))
    val got = spark.sql("SELECT graft_tokens(' A  b\tC ') AS t").head().getSeq[String](0)
    assert(got == Seq("a", "b", "c"))
  }
}
