package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev utility: dump formatted physical plans for every registered query
  * (or a named subset) and flag scale smells — cartesian products, missing
  * filter pushdown, full-column scans.
  * Usage: runMain graft.tools.Explain <sfDir> [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else SparkEntry.queries.keySet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).filter(t => names(t._1)).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      // EXPLAIN_EXECUTED=1: run the query first so the printed plan is the
      // FINAL adaptive plan (shows AQE decisions: reused stages, coalesced
      // partitions, skew splits) rather than the initial one.
      if (sys.env.contains("EXPLAIN_EXECUTED")) df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val smells = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
        .collect { case (s, true) => s }
      println(s"===== $name ${if (smells.nonEmpty) s"  !! ${smells.mkString(",")}" else ""}")
      println(plan)
    }
    spark.stop()
  }
}
