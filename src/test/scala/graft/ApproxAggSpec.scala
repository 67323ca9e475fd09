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

  test("DataSketches HLL per-type estimates and their union within 5% of exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val est = Queries.hllSketches(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    val ev = Tables(spark, sfDir, "events")
    val exactPerType = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val exactAll = ev.select(countDistinct($"user_id")).head().getLong(0)
    exactPerType.foreach { case (t, n) =>
      assert(math.abs(est(t).toDouble - n) / n <= 0.05,
        s"type $t: sketch ${est(t)} vs exact $n")
    }
    // the unioned sketch estimates the GLOBAL distinct count, not the
    // sum of per-type counts — that mergeability is the point
    assert(math.abs(est("ALL").toDouble - exactAll) / exactAll <= 0.05,
      s"union: sketch ${est("ALL")} vs exact $exactAll")
    assert(est("ALL") < exactPerType.values.sum,
      "union must dedup users shared across event types")
  }
}
