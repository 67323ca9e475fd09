package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins the q35/q45 SF-scale oracle mirrors ([[SfOracles]]) against the
  * distributed plans they grade — the same distributed-vs-straight-line
  * cross-check the golden twins run, but on the live sf0.001 corpus, so a
  * drift in either derivation path fails HERE before the driver's DuckDB
  * compare ever sees it. */
class SfOraclesSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("local xxh64 eval matches the distributed xxhash64 expression") {
    import spark.implicits._
    import org.apache.spark.sql.functions.xxhash64
    val samples = Seq("", "a", "plumber", "word soup  here", "Ärzte übermüdet",
      "0123456789" * 10)
    val dist = samples.toDF("s").select(xxhash64($"s")).collect().map(_.getLong(0))
    assert(samples.map(SfOracles.xxh64) == dist.toSeq)
  }

  test("title40 matches Spark substring semantics incl. multibyte") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, substring}
    val samples = Seq("", "short", "ü" * 45, "exactly-forty-characters-0123456789012345",
      "a much longer text that runs well past the forty character prefix boundary")
    val dist = samples.toDF("s").select(substring(col("s"), 1, 40)).collect()
      .map(_.getString(0))
    assert(samples.map(SfOracles.title40) == dist.toSeq)
  }

  test("q45 mirror reproduces the distributed text-UDF battery at sf0.001") {
    val got = Queries.textUdfs(spark, sfDir).collect()
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val m = SfOracles.textRowFor(SfOracles.title40(docs(r.getLong(0))))
      assert(r.getInt(1) == m.nStems, s"n_stems doc ${r.getLong(0)}")
      assert(r.getLong(2) == m.stemsHash, s"stems_hash doc ${r.getLong(0)}")
      assert(r.getInt(3) == m.tfidfCard, s"tfidf_card doc ${r.getLong(0)}")
      assert(r.getDouble(4) == m.weight, s"first_stem_weight doc ${r.getLong(0)}")
      assert(r.getString(5) == m.firstStem, s"first_stem doc ${r.getLong(0)}")
    }
  }

  test("q36 mirror reproduces the distributed simhash fingerprints at sf0.001") {
    val got = Queries.dedupSimhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, h) =>
      assert(h == SimhashGolden.simhashOf(docs(id)), s"simhash doc $id")
    }
  }

  private def embeddingsJvm = Tables(spark, sfDir, "embeddings")
    .selectExpr("cast(vec_id as long) as vec_id",
      "transform(embedding, x -> cast(x as double)) as v")
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    .sortBy(_._1).toIndexedSeq

  test("q37 mirror reproduces the distributed LSH-pruned Jaccard top-20 at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toIndexedSeq
    val got = Queries.ngramJaccardTop(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == SfOracles.jaccardTopRows(docs))
  }

  test("q38 mirror reproduces the distributed LSH kNN (rank AND score) at sf0.001") {
    val got = Queries.knnLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == SfOracles.lshTopKRows(embeddingsJvm, maxQid = 10L, k = 5))
  }

  test("q50 mirror reproduces the distributed near-dup clustering at sf0.001") {
    val got = Queries.embeddingDedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == SfOracles.nearDupClusterRows(embeddingsJvm, minCosine = 0.95))
  }

  test("halfUpNonNeg matches (x*1e9 + 0.5)::long for adversarial weights") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // boundary-dense samples: exact .5 ulps, tiny/huge magnitudes, values
    // whose canonical repr rounds differently than the binary expansion
    val rnd = new scala.util.Random(7)
    val samples = (Seq(0.0, 0.5e-9, 1.5e-9, 2.5e-9, 1.0 / 3.0, math.Pi,
      6.907755278982137, 0.1 + 0.2) ++
      (1 to 500).map(_ => rnd.nextDouble() * 50.0) ++
      (1 to 200).map(_ => rnd.nextDouble() * 1e-6)).map(x => x * x)
    val dist = samples.toDF("x")
      .select((col("x") * lit(1e9) + lit(0.5)).cast("long")).collect().map(_.getLong(0))
    val local = samples.map(x => SimJoinSfMirror.halfUpNonNeg(x * 1e9))
    assert(local == dist.toSeq)
  }

  test("sparkRoundToLong matches round(x*1e4)::long incl. negatives (DSIR λ/Gumbel)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, round}
    val rnd = new scala.util.Random(11)
    val samples = Seq(0.0, -0.5e-4, 1.5e-4, -2.5e-4, math.Pi, -math.E,
      -6.907755278982137) ++
      (1 to 500).map(_ => (rnd.nextDouble() - 0.5) * 40.0)
    val dist = samples.toDF("x")
      .select(round(col("x") * lit(1e4)).cast("long")).collect().map(_.getLong(0))
    val local = samples.map(x => SimJoinSfMirror.sparkRoundToLong(x * 1e4))
    assert(local == dist.toSeq)
  }

  test("q46 mirror reproduces the distributed generic top-1 join at sf0.001") {
    val got = Queries.similarityJoinGeneric(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.nonEmpty)
    assert(got.exists(_._3 != 0L), "corpus should produce real matches")
    got.foreach { case (id, rnk, alias) =>
      val want = SimJoinSfMirror
        .topKAgainstWinner(SfOracles.title40(docs(id))).getOrElse(0L)
      assert(rnk == 1 && alias == want, s"doc $id: got $alias want $want")
    }
  }

  test("q49 mirror reproduces the distributed threshold join at sf0.001") {
    val got = Queries.similarityJoinThreshold(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.toSeq.sortBy(_._1).flatMap { case (id, text) =>
      SimJoinSfMirror.thresholdWinner(SfOracles.title40(text))
        .map(alias => (id, 1, alias))
    }
    assert(want.nonEmpty, "threshold mirror should find some matches")
    assert(got == want)
  }

  test("q42 mirror reproduces the distributed IVF kNN (rank AND score) at sf0.001") {
    val got = Queries.knnIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.nonEmpty)
    assert(got == IvfMirror.recompute(embeddingsJvm))
  }

  test("q35 mirror reproduces the distributed fuzzy clustering at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toIndexedSeq
    val expect = DedupGolden.recomputeFor(docs)
    val got = Queries.dedupFuzzy(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }
}
