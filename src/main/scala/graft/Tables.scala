package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated TPC-H-ish testdata
  * (`/root/repo/TESTDATA.md`). One parquet file per table under the
  * scale-factor directory the driver passes to each query.
  *
  * Reads go through `spark.read.parquet` so Catalyst keeps predicate
  * pushdown / column pruning / partition-size planning — at 100 TB the same
  * code reads a partitioned parquet lake; nothing here is local-mode-only.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native
      // type for (SPARK-40819): read the raw int64 nanos and narrow to a
      // micros TIMESTAMP. `div` keeps the arithmetic in long space — a
      // double division would lose precision above 2^53 ns.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (for `spark.sql` surfaces). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
