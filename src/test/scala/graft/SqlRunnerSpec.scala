package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.SqlRunner

/** The reference's own example script (adapted: LOAD skipped, `text` →
  * STRING) must run end-to-end through the SQL surface. */
class SqlRunnerSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(rmrf))
    p.delete()
  }

  test("reference example script runs; known titles standardize to goldens") {
    spark.sql("DROP TABLE IF EXISTS job_titles")
    rmrf(new java.io.File("/tmp/graft-test-warehouse/job_titles"))
    val results = SqlRunner.runScript(spark, sfDir, "examples/job_titles_demo.sql")
    val last = results.last.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(last.size == 105) // all example titles are distinct
    assert(last("poet") == "Poet - Writers and Authors")
    assert(last("author") == "Author - Writers and Editors")
    assert(last("biologist") == "Biologist - Biological Scientists, All Other")
    spark.sql("DROP TABLE IF EXISTS job_titles")
  }

  test("README-style analytics script runs through views/rollup/split_part") {
    val results = SqlRunner.runScript(spark, sfDir, "examples/analytics_demo.sql")
    assert(results.size == 4)
    val categories = results.last.collect()
    assert(categories.nonEmpty)
    assert(categories.forall(_.getLong(1) > 0))
  }
}
