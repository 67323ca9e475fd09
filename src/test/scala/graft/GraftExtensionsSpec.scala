package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends AnyFunSuite {

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
}
