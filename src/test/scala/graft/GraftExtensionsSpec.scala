package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends AnyFunSuite {

  test("function is absent before registration, present after (reference negative test)") {
    // mirrors test/sql/title_mapper.test:5-9 — calling standardize_title
    // before LOAD must fail with a missing-function error
    val fresh = SparkSuiteBase.spark.newSession() // own function registry
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      fresh.sql("SELECT standardize_title('poet')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("standardize_title"))
    graft.functions.GraftFunctions.register(fresh)
    val out = fresh.sql("SELECT standardize_title('poet') AS s").collect().head.getString(0)
    assert(out == "Poet - Writers and Authors")
  }

  test("extension injects graft_dot as a resolvable function builder") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // Verify through the real registry path: a fresh session picks the
    // builder up when extensions apply; here we apply to the active
    // session's registry directly (shared test JVM).
    val spark = SparkSuiteBase.spark
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val d = spark.sql("SELECT graft_dot(array(1.0d,2.0d,3.0d), array(1.0d,1.0d,1.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d == 6.0)
  }

  test("literal standardize_title constant-folds at optimization time") {
    val spark = SparkSuiteBase.spark
    graft.expressions.StandardizeTitleExpr.ensureRegistered(spark)
    val df = spark.sql("SELECT standardize_title('poet') AS s")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("standardize_title"),
      s"expected the lookup folded to a literal, got:\n$optimized")
    assert(optimized.contains("Poet - Writers and Authors"))
    // column inputs must NOT fold — the per-row path stays
    val col = Tables(spark, SparkSuiteBase.sfDir, "documents")
      .selectExpr("standardize_title(text) AS s")
    assert(col.queryExecution.optimizedPlan.toString.contains("standardize_title"))
  }
}
