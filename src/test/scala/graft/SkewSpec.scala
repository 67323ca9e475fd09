package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 5k rows on one hot key + a sparse tail
    val big = spark.range(0, 5500).select(
      $"id",
      when($"id" < 5000, lit(7L)).otherwise($"id" % 50).as("k"))
    val small = spark.range(0, 50).select($"id".as("sk"), concat(lit("v"), $"id").as("payload"))

    val plain = big.join(small, $"k" === $"sk")
      .groupBy($"k").agg(count(lit(1)).as("n"), countDistinct($"payload").as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedJoin(big, small, "k", "sk", distributeBy = $"id", nSalt = 8)
      .groupBy($"k").agg(count(lit(1)).as("n"), countDistinct($"payload").as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
    // 5000 hot rows + 10 tail rows (ids 5007, 5057, … have id % 50 == 7)
    assert(plain(7L)._1 == 5010L, "hot key should dominate")
  }

  test("salted two-phase aggregation merges to the same totals") {
    import spark.implicits._
    val df = spark.range(0, 10000).select(
      ($"id" % 3).as("g"), ($"id" % 97).as("v"), $"id")
    val plain = df.groupBy($"g")
      .agg(sum($"v").as("s"), countDistinct($"v").as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedTwoPhaseAgg(df, Seq("g"), distributeBy = $"id", nSalt = 8)(
      partial = Seq(sum($"v").as("ps"), collect_set($"v").as("pd")),
      merge = Seq(sum($"ps").as("s"),
        size(array_distinct(flatten(collect_list($"pd")))).cast("long").as("d")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
  }
}
