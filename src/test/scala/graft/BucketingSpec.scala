package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** 100 TB design check: bucketed tables co-locate an equi-join — the
  * repeated-join workload pattern where pre-shuffling the data once at
  * write time removes the per-query exchange entirely. */
class BucketingSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("bucketBy join plans with zero shuffle exchanges") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      Tables(spark, sfDir, "orders")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables(spark, sfDir, "customer")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")

      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      val joinPlan = j.queryExecution.executedPlan.toString()
      // the join itself must consume bucketed scans directly — the only
      // allowed exchange is the one for the final small aggregation
      val beforeAgg = joinPlan.split("HashAggregate").last
      assert(!beforeAgg.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle its inputs:\n$joinPlan")

      // and it must agree with the plain (shuffled) join
      val plain = Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "customer"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      val a = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val b = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
