package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Tables, SparkEntry}
import graft.functions.GraftFunctions

/** SQL script surface: lets a reference user run their existing DuckDB
  * scripts against this engine — testdata tables and the engine's
  * functions are pre-registered, statements run in order.
  *
  * `LOAD …` lines are skipped (the Spark analog — function registration —
  * happens automatically), matching how the reference's own example
  * scripts begin with `load 'title_mapper.duckdb_extension'`.
  *
  * Usage: runMain graft.tools.SqlRunner <sfDir> <script.sql>
  */
object SqlRunner {

  /** Split a script into statements (naive `;` split — sufficient for the
    * reference's example scripts, which contain no quoted semicolons). */
  def statements(script: String): Seq[String] =
    script.split(";").map(_.trim)
      .filter(s => s.nonEmpty && !s.toLowerCase.startsWith("load "))
      .toSeq

  /** Run every statement; returns the result of each. */
  def runScript(spark: SparkSession, sfDir: String, path: String): Seq[DataFrame] = {
    Tables.registerAll(spark, sfDir)
    GraftFunctions.register(spark)
    val script = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    statements(script).map(spark.sql)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, file) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = runScript(spark, sfDir, file)
    results.lastOption.foreach(_.show(200, truncate = false))
    spark.stop()
  }
}
