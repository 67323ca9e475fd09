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

  /** Per-JVM cache of each input file's parquet schema: every
    * `spark.read.parquet(path)` without an explicit schema runs a
    * 1-task footer-read job, and nearly every query constructs 1-3
    * input frames — ~100 ms of fixed driver round-trip per query at
    * the bench SF (r18 measurement: JobProfile showed the footer job
    * as the first job of every query). The schema is immutable
    * metadata of an immutable input file, so caching it changes no
    * result — the data is still read from parquet on every run. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()
  private def readWithCachedSchema(spark: SparkSession,
      path: String): DataFrame = {
    val s = schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(s).parquet(path)
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
      // generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others
      // — adapt to whichever layout is on disk (the driver regenerates the
      // tables between rounds and the writer's type has changed before).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = readWithCachedSchema(spark, s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      raw.schema("ts").dataType match {
        // TIMESTAMP(NANOS) has no native Spark type (SPARK-40819): the
        // legacy conf surfaces raw int64 nanos; narrow to a micros
        // TIMESTAMP. `div` keeps the arithmetic in long space — a double
        // division would lose precision above 2^53 ns.
        case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        // Naive micros: reinterpret the wall-clock value as an instant
        // under the (UTC-pinned) session zone — identical epoch value to
        // the nanos-era narrowing, so every downstream epoch_us/date_part
        // contract is unchanged.
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else readWithCachedSchema(spark, s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (for `spark.sql` surfaces). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
