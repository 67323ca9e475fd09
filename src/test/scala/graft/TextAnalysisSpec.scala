package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.functions.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  test("language id picks the profile with most stopword hits") {
    assert(TextAnalysis.detectLang("the cat sat on the mat and it was happy") == "en")
    assert(TextAnalysis.detectLang("der Hund und die Katze sind nicht im Haus") == "de")
    assert(TextAnalysis.detectLang("el perro y la gata no se ven en la casa") == "es")
    assert(TextAnalysis.detectLang("") == "und")
    assert(TextAnalysis.detectLang(null) == "und")
    assert(TextAnalysis.detectLang("zzz qqq xxx") == "und")
  }

  test("quality metrics: hand-checked values") {
    import spark.implicits._
    val row = Seq("ab cd ab 12!").toDF("text")
      .select(TextAnalysis.qualityMetrics(col("text")).as("m"))
      .select("m.*").collect().head
    assert(row.getAs[Int]("n_chars") == 12)
    assert(row.getAs[Int]("n_tokens") == 4)
    assert(row.getAs[Int]("n_distinct_tokens") == 3)
    assert(row.getAs[Double]("type_token_ratio") == 0.75)
    assert(row.getAs[Double]("digit_ratio") == 2.0 / 12.0)
    assert(row.getAs[Double]("punct_ratio") == 1.0 / 12.0)
  }

  test("quality score: clean prose beats junk") {
    import spark.implicits._
    val scores = Seq(
      ("clean", "a reasonable sentence with several distinct meaningful words here"),
      ("junk", "!!! ??? 111 222 !!! ??? 111 222 !!!"))
      .toDF("tag", "text")
      .select(col("tag"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("clean") > scores("junk"))
  }

  test("token counts") {
    import spark.implicits._
    val r = Seq("Hello world, 42 times!").toDF("text")
      .select(
        TextAnalysis.tokenCountWs(col("text")).as("ws"),
        TextAnalysis.tokenCountRegex(col("text")).as("re"))
      .collect().head
    assert(r.getAs[Int]("ws") == 4)
    // hello | world | , | 42 | times | ! = 6
    assert(r.getAs[Int]("re") == 6)
  }

  test("fingerprint: equal for normalized-equal text, order-sensitive") {
    val a = TextAnalysis.fingerprint64("Hello   World")
    val b = TextAnalysis.fingerprint64("hello world")
    val c = TextAnalysis.fingerprint64("world hello")
    assert(a == b, "case + whitespace normalize away")
    assert(a != c, "token order matters")
  }
}
