package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev utility (r17 optimization round): per-JOB wall-clock of one
  * query's steady run, with gaps between jobs (driver-side planning /
  * collect handling) — tells whether a probe's seconds go to job
  * latency, inter-job driver work, or the final materialization.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.JobProfile q155
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = ArrayBuffer.empty[(Int, Long, String)] // id, startNs-ish, site
    val ends = scala.collection.mutable.Map.empty[Int, Long]
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (record)
        jobs.synchronized {
          // the first graft frame in the job's submission stack names the
          // operator-level call that launched it (callSite.short is often
          // unset under runMain)
          val site = js.stageInfos.headOption.map(_.details).flatMap(d =>
            d.linesIterator.find(l => l.contains("graft.") &&
              !l.contains("JobProfile"))).getOrElse("?").trim
          val tasks = js.stageInfos.map(_.numTasks).sum
          jobs += ((js.jobId, System.nanoTime(), s"[$tasks t] $site"))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (record)
        ends.synchronized { ends(je.jobId) = System.nanoTime() }
    })
    val fn = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.startsWith(name)).get._2
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    record = true
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val tMid = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val t1 = System.nanoTime()
    Thread.sleep(300)
    record = false
    println(f"== $name construct ${(tMid - t0) / 1e9}%.2f s exec ${(t1 - tMid) / 1e9}%.2f s ==")
    val sorted = jobs.sortBy(_._2)
    var prevEnd = t0
    sorted.foreach { case (id, st, site) =>
      val en = ends.getOrElse(id, st)
      println(f"job $id%4d gap ${(st - prevEnd) / 1e6}%7.1f ms  run ${(en - st) / 1e6}%7.1f ms  $site")
      prevEnd = math.max(prevEnd, en)
    }
    println(f"tail gap ${(t1 - prevEnd) / 1e6}%7.1f ms")
    spark.stop()
  }
}
