package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the whole point of `graft.sources.Bucketing`: a join AND an
  * aggregation keyed on the bucket key must be satisfied straight from the
  * bucketed scans — zero `Exchange hashpartitioning` nodes anywhere in the
  * plan. (The final `orderBy` keeps its range exchange: that one is the
  * deterministic-output requirement, not a join shuffle.)
  */
class BucketingSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("bucketed join + agg on the bucket key plans no hash-partition exchange") {
    val plan = SparkEntry.queries("q84_bucketed_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"q84 must sort-merge-join the co-located buckets:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"q84 must not shuffle for the join or the aggregate:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "q84 must exercise the bucketed SMJ path, not a broadcast")
  }

  test("bucketed round-trip preserves every row and column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt_spec").toString
    val src = Tables(spark, sfDir, "nation")
    val back = sources.Bucketing.writeBucketed(
      spark, src, "g_nation_bkt_spec", s"$dir/nation", 4, Seq("n_nationkey"))
    assert(back.count() == src.count())
    assert(back.columns.sorted.sameElements(src.columns.sorted))
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
