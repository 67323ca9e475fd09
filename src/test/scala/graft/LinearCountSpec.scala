package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.CardinalitySketch

/** Contract battery for the order-invariant cardinality sketch (q143):
  * linear-counting accuracy, bit-exact partitioning invariance (the
  * property the q63/q98 HLL family lacks), operator-vs-mirror parity on
  * the live corpus, the saturation edge, and the k=1 register guard. */
class LinearCountSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}
  import spark.implicits._

  test("estimate within 2% of exact at 100k distincts over a 2^17 register") {
    // 100k distinct values + every value duplicated (idempotence check)
    val df = spark.range(100000L)
      .select(lit("g").as("g"), concat(lit("v"), $"id").as("v"))
    val doubled = df.unionAll(df)
    val row = CardinalitySketch.linearCount(doubled, Seq("g"), "v").collect()(0)
    val est = row.getLong(2)
    assert(math.abs(est - 100000L) <= 2000L,
      s"linear count $est should be within 2% of 100000")
  }

  test("estimate is BIT-EXACT invariant to partitioning and row order") {
    val df = spark.range(50000L)
      .select((pmod($"id", lit(3))).cast("string").as("g"),
        concat(lit("v"), $"id").as("v"))
    def run(d: org.apache.spark.sql.DataFrame) =
      CardinalitySketch.linearCount(d, Seq("g"), "v")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val base = run(df)
    assert(run(df.repartition(17)) == base)
    assert(run(df.orderBy(desc("v"))) == base)
  }

  test("distributed q143 reproduces the straight-line mirror at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toIndexedSeq
    val want = LinearCountMirror.recompute(docs)
    assert(want.nonEmpty)
    val got = Queries.linearCountDistinct(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // and the exact column really is exact
    val exact = docs.filter(_._2 != null).groupBy(_._3)
      .map { case (l, ds) => l -> ds.map(_._2).distinct.size.toLong }
    Queries.linearCountDistinct(spark, sfDir).collect().foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)))
    }
  }

  test("saturated register (z=0) hits the documented deterministic ceiling") {
    // 64-bit register, 10k distincts: every bit set with near certainty
    val df = spark.range(10000L)
      .select(lit("g").as("g"), concat(lit("x"), $"id").as("v"))
    val row = CardinalitySketch.linearCount(df, Seq("g"), "v", numBits = 64L)
      .collect()(0)
    assert(row.getLong(1) == 64L, "all 64 bits should be set")
    assert(row.getLong(2) == math.round(64.0 * StrictMath.log(64.0)))
  }

  test("linearEstimate refuses a k!=1 sketch; linearCount validates sizing") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100L, 1024L) // k=7
    val baos = new java.io.ByteArrayOutputStream(); bf.writeTo(baos)
    intercept[IllegalArgumentException] {
      CardinalitySketch.linearEstimate(baos.toByteArray)
    }
    val df = Seq(("g", "v")).toDF("g", "v")
    intercept[IllegalArgumentException] {
      CardinalitySketch.linearCount(df, Seq("g"), "v", numBits = 100L) // not %64
    }
    intercept[IllegalArgumentException] { // above the session conf caps
      CardinalitySketch.linearCount(df, Seq("g"), "v", numBits = 1L << 30)
    }
  }
}
