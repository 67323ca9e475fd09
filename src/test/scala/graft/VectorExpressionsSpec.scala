package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions.dot
import graft.functions.GraftFunctions

class VectorExpressionsSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  test("graft_dot matches the zip_with/aggregate composition bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, 0.6)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      dot(spark)($"a", $"b").as("fused"),
      aggregate(zip_with($"a", $"b", _ * _), lit(0.0), (acc, x) => acc + x).as("composed"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array propagates null; SQL surface works after register") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]])).toDF("a", "b")
    assert(df.select(dot(spark)($"a", $"b")).collect().head.isNullAt(0))

    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(viaSql == 11.0)
  }

  test("interpreted eval agrees with codegen") {
    val e = graft.expressions.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.5, 2.5),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(2.0, 4.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 13.0)
  }
}
