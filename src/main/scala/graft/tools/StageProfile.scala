package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev utility (r17 optimization round): per-stage task-time breakdown of
  * one query's steady run — names the stage (by its callsite) whose tasks
  * burn the CPU that ProfileQuery's per-query totals flagged.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.StageProfile q155
  */
object StageProfile {
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
    val stages = ArrayBuffer.empty[(Int, String, Int, Long, Long, Long, Long)]
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val m = si.taskMetrics
          // the RDD chain names the SQL operators this stage executes —
          // the listener-level name for broadcast-future stages is an
          // anonymous callsite, useless for attribution
          val ops = si.rddInfos.map(_.name).distinct.mkString(">")
          stages += ((si.stageId, ops, si.numTasks,
            m.executorRunTime, m.executorDeserializeTime,
            m.executorCpuTime / 1000000L, m.jvmGCTime))
        }
    })
    val fn = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.startsWith(name)).get._2
    // two warmup runs: layout build + JIT
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    record = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    record = false
    println(f"== $name steady wall ${wall}%.2f s, ${stages.size} stages ==")
    println("stageId tasks runMs deserMs cpuMs gcMs  name")
    stages.sortBy(-_._4).foreach { case (id, nm, nt, rt, dt, ct, gc) =>
      println(f"$id%7d $nt%5d $rt%6d $dt%7d $ct%6d $gc%4d  ${nm.take(110)}")
    }
    spark.stop()
  }
}
