package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** S1 file-format coverage: the engine's tables round-trip through CSV and
  * JSON sources/sinks with schemas intact (Spark builtins; asserted so the
  * surface stays wired). */
class SourcesSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  private val dir = "/tmp/graft-sources-spec"

  test("CSV round-trip preserves rows and values") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"source", $"n_chars")
    docs.write.mode("overwrite").option("header", "true").csv(s"$dir/docs_csv")
    val back = spark.read.option("header", "true")
      .schema(docs.schema).csv(s"$dir/docs_csv")
    assert(back.count() == docs.count())
    val a = docs.orderBy($"doc_id").collect().toSeq
    val b = back.orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }

  test("JSON round-trip preserves nested struct values") {
    import spark.implicits._
    val nested = Tables(spark, sfDir, "documents")
      .select($"doc_id", struct($"lang", $"source").as("meta"), $"n_chars")
    nested.write.mode("overwrite").json(s"$dir/docs_json")
    val back = spark.read.schema(nested.schema).json(s"$dir/docs_json")
    val a = nested.orderBy($"doc_id").collect().toSeq
    val b = back.orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }
}
