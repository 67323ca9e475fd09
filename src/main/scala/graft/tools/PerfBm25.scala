package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level breakdown of the BM25 serving-index probe on the
  * zipf-common workload — the r12 verdict's 1568s-index vs 698s-batch
  * finding at 100M (182.5 vs 85.5 at 10M). Reconstructs the probe's
  * internals piecewise over the PUBLIC index tables so each cost is
  * visible: posting scan (IN-filter), scoring join, (qid, doc)
  * aggregation, top-k window. No assertions — run, read, iterate. */
object PerfBm25 {

  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[perf] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "48g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the ScaleSmoke zipf generator, verbatim shape
    def zipfToken(i: Int) = {
      val u = pmod(xxhash64($"seed", lit(i)), lit(10000L)).cast("double") / 10000.0
      concat(lit("w"), floor(u * u * u * 10000.0).cast("long"))
    }
    val docs = spark.range(nDocs)
      .withColumn("seed", when(pmod($"id", lit(100L)) < 5, $"id" - pmod($"id", lit(20L))).otherwise($"id"))
      .withColumn("text", concat_ws(" ", (0 until 16).map(zipfToken): _*))
      .select($"id", $"text")

    val qs = docs.filter($"id" < 100L)
      .select($"id".as("qid"), explode(slice(split($"text", " "), 1, 6)).as("term"))
      .distinct().localCheckpoint(true)
    val qTerms = qs.select($"term").distinct().collect().map(_.getString(0))
    println(s"[perf] nDocs=$nDocs queries=100 distinctTerms=${qTerms.length}")

    val dir = java.nio.file.Files.createTempDirectory("graft_bm25perf").toString
    time(s"index BUILD ($nDocs docs)") {
      graft.operators.Bm25.buildIndex(docs, "id", "text", "g_perf", s"$dir/idx", nDirs = 64)
    }

    // ---- component breakdown over the public tables ----
    def xxh(s: String): Long = {
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
      import org.apache.spark.unsafe.types.UTF8String
      XxHash64(Seq(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)), 42L)
        .eval(InternalRow.empty).asInstanceOf[Long]
    }
    val nDirs = 64L
    val tbs = qTerms.map(t => Math.floorMod(xxh(t), nDirs)).distinct.toSeq
    println(s"[perf] dirs touched: ${tbs.length}/64")

    val scan = spark.table("g_perf_postings")
      .filter($"tb".isin(tbs: _*) && $"term".isin(qTerms.toSeq: _*))
      .select($"term", $"doc_id", $"tf", $"dl")
    val nPostings = time("1. posting scan (IN filter) count") { scan.count() }
    println(s"[perf]    matching postings: $nPostings")
    time("1b. posting scan, all cols forced") {
      scan.agg(sum($"tf"), sum($"dl"), sum($"doc_id")).collect()
    }

    val termDfs = spark.table("g_perf_dfs")
      .filter($"tb".isin(tbs: _*) && $"term".isin(qTerms.toSeq: _*))
      .select($"term", $"df").collect().map(r => (r.getString(0), r.getLong(1)))
    val dfsDf = spark.createDataFrame(termDfs.toSeq).toDF("term", "df")
    val totals = spark.table("g_perf_bounds").select($"n", $"sumdl")
    val (k1, b) = (1.2, 0.75)
    val avgdl = $"sumdl".cast("double") / $"n"
    val idf = log(lit(1.0) + ($"n" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
    val tfPart = ($"tf" * lit(k1 + 1.0)) /
      ($"tf" + lit(k1) * (lit(1.0) - lit(b) + lit(b) * ($"dl" / avgdl)))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"qid").orderBy($"score_e4".desc, $"doc_id".asc)
    def tail(sc: DataFrame, label: String): Unit = {
      val joined = broadcast(qs).join(sc, Seq("term"))
        .join(broadcast(dfsDf), Seq("term"))
        .crossJoin(broadcast(totals))
        .select($"qid", $"doc_id", round(idf * tfPart * lit(1e4)).cast("long").as("c_e4"))
      val scores = joined.groupBy($"qid", $"doc_id").agg(sum($"c_e4").as("score_e4"))
      time(s"3. agg count [$label]") { scores.count() }
      time(s"4. agg + window [$label]") {
        scores.withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
          .agg(count(lit(1)), sum($"score_e4"), sum($"doc_id")).collect()
      }
    }
    tail(scan, "as-is (skewed dirs)")
    tail(scan.repartition(64), "repartition(64) after scan")

    time("5. probe FULL (topKAgainstIndex)") {
      graft.operators.Bm25.topKAgainstIndex(qs, "g_perf", k = 10)
        .agg(count(lit(1)), sum($"score_e4"), sum($"doc_id")).collect()
    }
    spark.stop()
  }
}
