package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Lake-operations contracts: compacted writes keep the file count bounded
  * regardless of input parallelism, and schema evolution reads merge old
  * and new partitions.
  */
class LakeSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("writeCompacted bounds files per partition dir to ceil(rows/max)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_lake").toString
    val docs = Tables(spark, sfDir, "documents")
      .repartition(32) // worst-case input parallelism: naive write = up to 32 files/dir
    sources.LakeWriter.writeCompacted(
      docs, root, Seq("lang"), maxRecordsPerFile = 100L, sortCols = Seq("doc_id"))

    val perLang = docs.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      val files = new java.io.File(s"$root/lang=$lang")
        .listFiles.count(_.getName.endsWith(".parquet"))
      val want = math.ceil(n / 100.0).toInt
      assert(files == want, s"lang=$lang: $files files, expected $want for $n rows")
    }
    // lossless incl. the partition column
    val back = spark.read.parquet(root)
    assert(back.count() == docs.count())
    assert(back.agg(bit_xor(xxhash64($"doc_id", $"lang", $"n_chars"))).head.getLong(0) ==
      docs.agg(bit_xor(xxhash64($"doc_id", $"lang", $"n_chars"))).head.getLong(0))
  }

  test("mergeSchema reads old partitions alongside a widened schema") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_evo").toString
    // day 1: (doc_id, lang); day 2 adds a quality column
    Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
      .write.parquet(s"$root/day=1")
    Seq((3L, "en", 0.9), (4L, "fr", 0.2)).toDF("doc_id", "lang", "quality")
      .write.parquet(s"$root/day=2")
    val lake = spark.read.option("mergeSchema", "true").parquet(root)
    assert(lake.columns.toSet == Set("doc_id", "lang", "quality", "day"))
    val rows = lake.select($"doc_id", $"quality").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(0.9), 4L -> Some(0.2)))
  }
}
