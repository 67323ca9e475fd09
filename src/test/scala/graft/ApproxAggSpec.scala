package graft

import org.scalatest.funsuite.AnyFunSuite

/** Approximate-aggregate error bounds: HLL++ distinct counts within the
  * configured relative error of the exact answer, approx_percentile within
  * rank tolerance of the true median. These are the aggregates that
  * replace exact COUNT(DISTINCT)/percentile shuffles at 100 TB. */
class ApproxAggSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("HLL distinct within 5x rsd of exact; approx median within 5% of exact") {
    import spark.implicits._
    val rows = Queries.approxAggs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_sources").toDouble
      val exact = r.getAs[Long]("exact_sources").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"lang ${r.getString(0)}: HLL $approx vs exact $exact")
    }
    val exactMedians = Tables(spark, sfDir, "documents")
      .groupBy($"lang")
      .agg(org.apache.spark.sql.functions.expr("percentile(n_chars, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val am = r.getAs[Long]("approx_median_chars").toDouble
      val em = exactMedians(r.getString(0))
      assert(math.abs(am - em) / em <= 0.05,
        s"lang ${r.getString(0)}: approx median $am vs exact $em")
    }
  }
}
