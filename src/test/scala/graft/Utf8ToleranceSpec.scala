package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Invalid-UTF-8 tolerance: the reference decodes inputs with
  * `String::from_utf8_lossy` (`/root/reference/src/lib.rs:30`) — invalid
  * bytes become U+FFFD and the function never errors. Spark strings
  * arriving from parquet are valid UTF-8, but a binary→string cast can
  * carry arbitrary bytes; this pins that the whole standardize path (cast,
  * registered function, tokenizer) tolerates them with the same
  * replacement semantics. */
class Utf8ToleranceSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  test("malformed bytes through binary->string->standardize_title: lossy, never errors") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // "software <0xFF 0xFE> engineer" + a truncated 3-byte sequence tail
    val bad = Array[Byte]('s', 'o', 'f', 't', 'w', 'a', 'r', 'e', ' ',
      0xFF.toByte, 0xFE.toByte, ' ',
      'e', 'n', 'g', 'i', 'n', 'e', 'e', 'r', ' ', 0xE2.toByte, 0x82.toByte)
    val out = Seq(Tuple1(bad)).toDF("raw")
      .select(call_function("standardize_title", $"raw".cast("string")).as("std"))
      .collect()(0).getString(0)
    // replacement chars are non-word chars — the tokenizer drops them, so
    // the result equals the clean input's standardization
    val clean = graft.functions.TitleStandardizer.standardize("software engineer")
    assert(out == clean)
  }

  test("scala-level: U+FFFD-bearing and garbage-only inputs standardize without error") {
    import graft.functions.TitleStandardizer
    assert(TitleStandardizer.standardize("software � engineer") ==
      TitleStandardizer.standardize("software engineer"))
    // garbage-only input: all tokens OOV -> reference -0.0 fallback, corpus[0]
    assert(TitleStandardizer.standardize("��") ==
      TitleStandardizer.standardize(""))
  }
}
