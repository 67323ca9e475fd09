package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SimilarityJoin
import graft.text.Tokenize

/** Ad-hoc stage-by-stage profiler for the q49 threshold-similarity-join
  * shape (no assertions — run, read, iterate; not part of the bench). */
object PerfQ49 {
  def time(label: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[perf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables(spark, sfDir, "documents")
      .withColumn("title", substring($"text", 1, 40))
      .select($"doc_id", $"title")
    val corpusDf = graft.dict.TitleDictionary.corpus.zipWithIndex
      .map { case (alias, i) => (i.toLong, alias) }.toSeq
      .toDF("alias_id", "alias")

    (1 to 3).foreach { round =>
      println(s"== round $round ==")
      val tokensUdf = udf((s: String) =>
        if (s == null) Array.empty[String] else Tokenize.tokenizeAndStem(s))
      val rTok = corpusDf
        .select(col("alias_id").as("rid"), tokensUdf(col("alias")).as("toks"))
        .withColumn("len", size($"toks"))
        .cache()
      val t0 = System.nanoTime()
      val numDocs = rTok.count()
      println(f"[perf] rTok count                 ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      val rTerms = rTok
        .select($"rid", $"len", explode($"toks").as("term"))
        .groupBy($"rid", $"len", $"term").agg(count(lit(1)).as("cnt"))
      val idf = rTerms.groupBy($"term").agg(count(lit(1)).as("df"))
        .withColumn("idf", log(lit(numDocs.toDouble) / $"df"))
      val rWeights = rTerms.join(idf, "term")
        .withColumn("dw", ($"cnt".cast("double") / $"len") * $"idf")
        .select($"term", $"df", $"rid", $"dw")
        .cache()
      rWeights.count()

      val lAgg = docs
        .select(col("doc_id").as("qid"), tokensUdf($"title").as("toks"))
        .withColumn("len", size($"toks"))
        .select($"qid", $"len", explode($"toks").as("term"))
        .groupBy($"qid", $"len", $"term").agg(count(lit(1)).as("cnt"))
        .join(idf, "term")
        .withColumn("qw", ($"cnt".cast("double") / $"len") * $"idf")
        .groupBy($"qid")
        .agg(map_from_arrays(collect_list($"term"), collect_list($"qw")).as("qvec"),
          sum(($"qw" * $"qw" * lit(1e9) + lit(0.5)).cast("long")).as("qn2_e9"))
        .select($"qid", $"qvec", sqrt($"qn2_e9".cast("double") / lit(1e9)).as("qnorm"))
        .cache()
      time("lAgg (cache fill)")(lAgg)
      time("lAgg (cached)")(lAgg)

      val bound = 0.3 - 1e-6
      val prefixUdf = udf { (vec: Map[String, Double], qnorm: Double) =>
        val ordered = vec.toArray
          .map { case (t, qw) => (t, (qw * 1e9 + 0.5).toLong) }
          .sortBy(x => (-x._2, x._1))
        var tail = 0L
        ordered.foreach(tail += _._2)
        val out = Array.newBuilder[String]
        var i = 0
        var go = true
        while (go && i < ordered.length) {
          if (tail.toDouble / 1e9 / qnorm >= bound) {
            out += ordered(i)._1; tail -= ordered(i)._2; i += 1
          } else go = false
        }
        out.result()
      }
      val prefixTerms = lAgg.filter($"qnorm" > 0.0)
        .select($"qid", explode(prefixUdf($"qvec", $"qnorm")).as("term"))
      time("prefixTerms")(prefixTerms)
      val dfCap = math.max(1.0, 0.05 * numDocs)
      val postings = rWeights.filter($"df" <= dfCap).select($"term", $"rid")
      val candidates = prefixTerms
        .join(postings, "term")
        .groupBy($"qid").agg(collect_set($"rid").as("rids"))
      time("candidates")(candidates)
      val rVecs = rWeights.groupBy($"rid")
        .agg(map_from_arrays(collect_list($"term"), collect_list($"dw")).as("dvec"),
          sum(($"dw" * $"dw" * lit(1e9) + lit(0.5)).cast("long")).as("dn2_e9"))
        .select($"rid", $"dvec", sqrt($"dn2_e9".cast("double") / lit(1e9)).as("doc_norm"))
      val sparseDot = udf { (a: Map[String, Double], b: Map[String, Double]) =>
        val (small, big) = if (a.size <= b.size) (a, b) else (b, a)
        small.toArray.sortBy(_._1).foldLeft(0.0) { case (acc, (t, w)) =>
          acc + big.getOrElse(t, 0.0) * w
        }
      }
      val scored = candidates
        .join(lAgg, "qid")
        .select($"qid", $"qvec", $"qnorm", explode($"rids").as("rid"))
        .join(rVecs, "rid")
        .withColumn("score",
          when($"doc_norm" > 0.0 && $"qnorm" > 0.0,
            sparseDot($"qvec", $"dvec") / ($"doc_norm" * $"qnorm")).otherwise(lit(0.0)))
      time("scored")(scored)
      val w = Window.partitionBy($"qid").orderBy($"score".desc, $"rid".asc)
      val topk = scored
        .filter($"score" >= 0.3)
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 1)
        .select($"qid".as("doc_id"), $"rnk", $"rid".as("alias_id"))
      time("topk (no sort)")(topk)
      time("topk + orderBy")(topk.orderBy($"doc_id"))
      lAgg.unpersist(); rWeights.unpersist(); rTok.unpersist()

      // end-to-end operator call for comparison
      time("OPERATOR end-to-end")(graft.Queries.similarityJoinThreshold(spark, sfDir))
    }
    spark.stop()
  }
}
