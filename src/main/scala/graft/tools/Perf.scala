package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.CorpusFilters

/** Ad-hoc micro-profiler for expression-level hotspots (no assertions —
  * run, read, iterate). */
object Perf {
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
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables(spark, sfDir, "documents").select($"doc_id", $"text")
    time("warmup count")(docs)

    val ts = CorpusFilters.words($"text")
    time("words size")(docs.select($"doc_id", size(ts).as("x")))
    time("words distinct")(docs.select($"doc_id", size(array_distinct(ts)).as("x")))
    time("agg char sum")(docs.select($"doc_id",
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).as("x")))
    time("filter rlike")(docs.select($"doc_id",
      size(filter(ts, t => t.rlike("[a-z]"))).as("x")))
    time("filter isin")(docs.select($"doc_id",
      size(filter(ts, t => t.isin(CorpusFilters.GopherStopwords: _*))).as("x")))
    val g2 = CorpusFilters.wordNGrams(ts, 2)
    time("g2 size")(docs.select($"doc_id", size(g2).as("x")))
    time("g2 distinct")(docs.select($"doc_id", size(array_distinct(g2)).as("x")))
    val g3 = CorpusFilters.wordNGrams(ts, 3)
    time("g3 size")(docs.select($"doc_id", size(g3).as("x")))
    time("g3 distinct")(docs.select($"doc_id", size(array_distinct(g3)).as("x")))
    time("full gopherRules")(CorpusFilters.gopherRules(docs, "doc_id", "text"))

    // staged variants: ts as a materialized column, lambdas reference the
    // attribute (cheap) instead of the inlined split+filter expression
    val staged = docs.select($"doc_id", ts.as("ts"))
    time("staged g2 size")(staged.select($"doc_id",
      size(CorpusFilters.wordNGrams($"ts", 2)).as("x")))
    time("staged g3 size")(staged.select($"doc_id",
      size(CorpusFilters.wordNGrams($"ts", 3)).as("x")))
    time("staged g3 distinct")(staged.select($"doc_id",
      size(array_distinct(CorpusFilters.wordNGrams($"ts", 3))).as("x")))
    val staged2 = staged.select($"doc_id", $"ts",
      CorpusFilters.wordNGrams($"ts", 2).as("g2"),
      CorpusFilters.wordNGrams($"ts", 3).as("g3"))
    time("staged all metrics")(staged2.select($"doc_id",
      size($"ts").as("a"), size(array_distinct($"ts")).as("b"),
      aggregate($"ts", lit(0L), (acc, t) => acc + length(t)).as("c"),
      size(filter($"ts", t => t.rlike("[a-z]"))).as("d"),
      size(filter($"ts", t => t.isin(CorpusFilters.GopherStopwords: _*))).as("e"),
      size($"g2").as("f"), size(array_distinct($"g2")).as("g"),
      size($"g3").as("h"), size(array_distinct($"g3")).as("i")))

    // contamination pieces
    val grams3 = array_distinct(CorpusFilters.wordNGrams(ts, 3))
    time("grams3 build")(docs.select($"doc_id", size(grams3).as("x")))
    time("grams3 explode")(docs.select($"doc_id", explode(grams3).as("g")))
    // contamination stage-by-stage
    val split = graft.operators.Sampling.deterministicSplit(
        Tables(spark, sfDir, "documents"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .filter($"split".isin("train", "test"))
      .select($"doc_id", $"split", CorpusFilters.words($"text").as("ts"))
    time("contam: split+ts")(split)
    val gdf = split.select($"doc_id", $"split",
      array_distinct(CorpusFilters.wordNGrams($"ts", 3)).as("grams"))
    time("contam: +grams")(gdf)
    val ex = gdf.select($"doc_id", $"split", explode($"grams").as("gram"))
    time("contam: explode")(ex)
    val tr = ex.filter($"split" === "train").select($"gram").distinct()
    time("contam: train distinct")(tr)
    val te = ex.filter($"split" === "test").select($"doc_id", $"gram")
    val sh = te.join(tr, "gram").groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
    time("contam: shared join")(sh)
    // block CollapseProject from inlining the gram build into Generate
    val gdf2 = gdf.select($"doc_id", $"split", $"grams", size($"grams").as("ng"))
    val ex2 = gdf2.select($"doc_id", $"split", explode($"grams").as("gram"))
    time("contam: explode noinline")(ex2)
    val mat = gdf.localCheckpoint(true)
    time("contam: explode pre-mat")(
      mat.select($"doc_id", $"split", explode($"grams").as("gram")))
    time("plain split explode")(Tables(spark, sfDir, "documents")
      .select($"doc_id",
        explode(org.apache.spark.sql.functions.split($"text", " ")).as("w")))
    time("plain words explode")(Tables(spark, sfDir, "documents")
      .select($"doc_id", explode(CorpusFilters.words($"text")).as("w")))
    time("full contamination")(CorpusFilters.contamination(
      Tables(spark, sfDir, "documents"), "doc_id", "text",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), n = 3))
    spark.stop()
  }
}
