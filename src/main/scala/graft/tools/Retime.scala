package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: steady-state retiming of named bench queries — the
  * noise-or-drift triage for regress-map entries (the r12 method that
  * separated the q49 real drift from three host-noise blips). Runs each
  * named query `reps` times in one warmed JVM on the bench corpus and
  * prints every sample plus min/median, so a sub-second bench delta can
  * be attributed: medians at the previous steady value ⇒ host noise;
  * medians at the new value ⇒ real drift, go bisect.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   runMain graft.tools.Retime q130 q125 q137 [reps=5]
  */
object Retime {
  def main(args: Array[String]): Unit = {
    val names = args.filter(_.startsWith("q"))
    val reps = args.find(!_.startsWith("q")).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.startsWith) }
    // warmup (same as Bench): JIT + parquet reader + shuffle machinery
    graft.SparkEntry.queries.toSeq.sortBy(_._1).headOption
      .foreach(_._2(spark, sfDir).write.format("noop").mode("overwrite").save())
    qs.foreach { case (name, fn) =>
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = samples.sorted
      println(f"[retime] $name: " +
        samples.map(s => f"$s%.2f").mkString(" ") +
        f" | min=${sorted.head}%.2f median=${sorted(reps / 2)}%.2f")
    }
    spark.stop()
  }
}
