package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("capacity above vocabulary size gives exact counts") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select(split(trim($"text"), " ").as("toks"))
    val hh = udaf(new HeavyHitters(4096))
    val sketch = docs.agg(hh($"toks").as("hh"))
      .select(explode($"hh").as("tc"))
      .select($"tc._1".as("token"), $"tc._2".as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.select(explode($"toks").as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch == exact)
  }

  test("small capacity still surfaces guaranteed heavy hitters") {
    import spark.implicits._
    // 60 occurrences of "hot" among 100 tokens; capacity 5 ⇒ threshold
    // N/capacity = 20 < 60, so "hot" MUST survive with count >= 40
    val rows = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"t$i"))
      .grouped(10).map(_.toSeq).toSeq
    val df = rows.toDF("toks")
    val hh = udaf(new HeavyHitters(5))
    val out = df.agg(hh($"toks").as("hh"))
      .select(explode($"hh").as("tc"))
      .select($"tc._1".as("token"), $"tc._2".as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("hot"))
    assert(out("hot") >= 60L - 100L / 5L && out("hot") <= 60L)
  }
}
