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

  test("partition pruning reaches the Hive-partitioned lake scan") {
    import spark.implicits._
    // the q83 lake layout: at 100 TB a `WHERE lang = …` must be served by
    // the directory structure (PartitionFilters), never a full scan
    Tables(spark, sfDir, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(s"$dir/lake")
    val q = spark.read.parquet(s"$dir/lake").filter($"lang" === "en")
    val detail = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters:.*\\(lang#\\d+ = en\\)".r
      .findFirstIn(detail).isDefined,
      s"lang filter must prune partitions at the scan:\n$detail")
    // and the pruned read returns exactly the partition's rows
    val expected = Tables(spark, sfDir, "documents")
      .filter($"lang" === "en").count()
    assert(q.count() == expected)
  }

  test("ORC round-trip preserves rows and values") {
    import spark.implicits._
    val src = Tables(spark, sfDir, "part")
    src.write.mode("overwrite").orc(s"$dir/part_orc")
    val back = spark.read.orc(s"$dir/part_orc")
    assert(back.orderBy($"p_partkey").collect().toSeq ==
      src.orderBy($"p_partkey").collect().toSeq)
  }
}
