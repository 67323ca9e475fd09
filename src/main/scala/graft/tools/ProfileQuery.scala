package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev utility (r17 optimization round): split a query's steady time into
  * CONSTRUCTION (eager driver work — resolve folds, bounded collects,
  * cap-check takes — every Spark job launched before the returned
  * DataFrame is acted on) vs EXECUTION (the noop materialization), with
  * job/stage/task counts for each phase. A query whose time is mostly
  * construction jobs is bounded by sequential driver round-trips, not by
  * the plan — a different fix (fuse/defer the collects) than a slow plan.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQuery q152 q184 ...
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args.filter(_.startsWith("q"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        taskTimeMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
    })
    def snap(): (Int, Int, Int, Long) =
      (jobs.get(), stages.get(), tasks.get(), taskTimeMs.get())

    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.startsWith) }
    // warmup: JIT + layout build (run each query once, untimed)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).headOption
      .foreach(_._2(spark, sfDir).write.format("noop").mode("overwrite").save())
    qs.foreach { case (name, fn) =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    println("query                      construct_s exec_s  c_jobs e_jobs c_stages e_stages c_tasks e_tasks c_taskms e_taskms")
    qs.foreach { case (name, fn) =>
      (1 to 2).foreach { rep =>
        val (j0, s0, t0, m0) = snap()
        val w0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val w1 = System.nanoTime()
        val (j1, s1, t1, m1) = snap()
        df.write.format("noop").mode("overwrite").save()
        val w2 = System.nanoTime()
        // listener events are async — give the bus a beat before reading
        Thread.sleep(200)
        val (j2, s2, t2, m2) = snap()
        if (rep == 2)
          println(f"$name%-26s ${(w1 - w0) / 1e9}%11.2f ${(w2 - w1) / 1e9}%6.2f ${j1 - j0}%6d ${j2 - j1}%6d ${s1 - s0}%8d ${s2 - s1}%8d ${t1 - t0}%7d ${t2 - t1}%7d ${m1 - m0}%8d ${m2 - m1}%8d")
      }
    }
    spark.stop()
  }
}
