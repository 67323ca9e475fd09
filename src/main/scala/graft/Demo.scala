package graft

import org.apache.spark.sql.SparkSession
import graft.functions.GraftFunctions

/** Manual smoke driver: exercises the engine through its real surface —
  * `spark.sql` after session registration — mirroring the reference's
  * `SELECT standardize_title(col) FROM t` usage (README examples). */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    println("== golden sqllogictest vectors via spark.sql ==")
    spark.sql(
      """SELECT title, standardize_title(title) AS standardized FROM VALUES
        | ('robotics engineer'), ('digital strategist'), ('poet'),
        | ('author'), ('biologist'), ('1234 !!'), (''), (NULL),
        | ('Ingeniería Química'), ('SENIOR Software   Dev-Ops!!')
        | AS t(title)""".stripMargin).show(20, false)

    println("== flagship: standardize documents.text at sf0.001 ==")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents")
    spark.sql(
      """SELECT standardize_title(substr(text, 1, 40)) AS std, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY n DESC, std LIMIT 10""".stripMargin)
      .show(10, false)

    spark.stop()
  }
}
