package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.CorpusFilters

/** Contract battery for Bloom-filter decontamination (q141): the
  * no-false-negative guarantee vs the exact gram join, planted
  * contamination recovery, byte parity between the distributed
  * `bloom_filter_agg` and the mirror's local sketch build, partitioning
  * invariance, hostile inputs, and mirror-vs-distributed on the live
  * sf0.001 corpus. */
class BloomDecontSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}
  import spark.implicits._

  private val leak = "the quick brown fox jumps over lazy rivers tonight"
  private def testDf = Seq(
    (900L, s"held out eval doc with $leak inside it"),
    (901L, "another evaluation document kept apart")).toDF("doc_id", "text")
  private def trainDf = Seq(
    (1L, s"training doc that copied $leak verbatim"),          // contaminated
    (2L, "a perfectly clean training document about nothing"), // clean
    (3L, "short"),                                             // < n tokens
    (4L, null.asInstanceOf[String]),                           // null text
    (5L, "another evaluation document kept apart")             // full-copy dup
  ).toDF("doc_id", "text")

  test("planted contamination flagged; clean/short/null docs pass") {
    val out = CorpusFilters.bloomDecontaminate(trainDf, testDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // the 9-token leak contributes 9-3+1 = 7 contiguous shared 3-grams
    assert(out(1L)._3 && out(1L)._2 >= 7, "verbatim leak must be flagged on many grams")
    assert(!out(2L)._3 && out(2L)._2 == 0L)
    assert(out(3L) == ((0L, 0L, false)) && out(4L) == ((0L, 0L, false)))
    assert(out(5L)._3, "a full copy of a test doc must be flagged")
  }

  test("no false negatives vs the exact gram join on sf0.001") {
    val labeled = graft.operators.Sampling.deterministicSplit(
      Tables(spark, sfDir, "documents"), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val train = labeled.filter($"split" === "train")
    val test = labeled.filter($"split" === "test")
    val bloom = CorpusFilters.bloomDecontaminate(train, test, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // exact truth: per-train-doc count of gram OCCURRENCES whose gram
    // appears anywhere in the test split
    val gramsOf = (df: org.apache.spark.sql.DataFrame) => df.select($"doc_id",
      explode(CorpusFilters.wordNGrams(CorpusFilters.words($"text"), 3)).as("gram"))
    val testGrams = gramsOf(test).select($"gram").distinct()
    val truth = gramsOf(train).join(testGrams, "gram")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_true"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truth.nonEmpty, "corpus should contain some real overlap")
    truth.foreach { case (id, nTrue) =>
      assert(bloom(id)._1 >= nTrue,
        s"doc $id: bloom flagged ${bloom(id)._1} < $nTrue truly-shared grams (false negative!)")
    }
    val fp = bloom.count { case (id, (n, _)) => n > truth.getOrElse(id, 0L) }
    assert(fp <= bloom.size / 20,
      s"false-positive docs should be rare at these numBits: $fp of ${bloom.size}")
  }

  test("distributed bloom_filter_agg bytes == mirror's local sketch build") {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val grams = Seq.tabulate(500)(i => s"gram number $i payload")
    val agg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64($"g")),
      Literal(1L << 20), Literal(1L << 23)).toAggregateExpression())
    val dist = grams.toDF("g").repartition(13)
      .agg(agg.as("bf")).collect()(0).getAs[Array[Byte]](0)
    val local = org.apache.spark.util.sketch.BloomFilter.create(1L << 20, 1L << 23)
    grams.foreach(g => local.putLong(SfOracles.xxh64(g)))
    val baos = new java.io.ByteArrayOutputStream(); local.writeTo(baos)
    assert(java.util.Arrays.equals(baos.toByteArray, dist),
      "partial OR-merged distributed filter must be byte-identical to a local build")
  }

  test("output is invariant to input partitioning") {
    val base = CorpusFilters.bloomDecontaminate(trainDf, testDf, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val repart = CorpusFilters.bloomDecontaminate(
        trainDf.repartition(7), testDf.repartition(5), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(base == repart)
  }

  test("empty test corpus flags nothing") {
    val out = CorpusFilters.bloomDecontaminate(
        trainDf, testDf.filter($"doc_id" < 0), "doc_id", "text")
      .collect().map(r => (r.getLong(2), r.getBoolean(3)))
    assert(out.forall(_ == ((0L, false))))
  }

  // Spark's BloomFilterAggregate silently Math.min-clamps its literals to
  // spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits
  // (defaults 4M / 2^26) — the divergence regime a >4M-gram test split
  // enters at 10M+ docs. Pinned here by LOWERING the confs so a small
  // corpus crosses the boundary, rather than building a 4M-item filter.
  private def withLowBloomConfs[T](maxItems: Long, maxBits: Long)(f: => T): T = {
    val ik = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bk = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (i0, b0) = (spark.conf.get(ik), spark.conf.get(bk))
    spark.conf.set(ik, maxItems.toString); spark.conf.set(bk, maxBits.toString)
    try f finally { spark.conf.set(ik, i0); spark.conf.set(bk, b0) }
  }

  test("Spark's internal conf clamp matches the model bloomSizing replays") {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val grams = Seq.tabulate(5000)(i => s"clamp probe gram $i")
    val dist = withLowBloomConfs(2000L, 16384L) {
      // literals ABOVE the lowered confs: 5000 items / 75000 bits requested
      val agg = ColumnBridge.column(new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64($"g")),
        Literal(5000L), Literal(75000L)).toAggregateExpression())
      grams.toDF("g").repartition(13).agg(agg.as("bf"))
        .collect()(0).getAs[Array[Byte]](0)
    }
    // Spark must have built with the CLAMPED (2000, 16384), not the literals
    val clamped = org.apache.spark.util.sketch.BloomFilter.create(2000L, 16384L)
    grams.foreach(g => clamped.putLong(SfOracles.xxh64(g)))
    val baos = new java.io.ByteArrayOutputStream(); clamped.writeTo(baos)
    assert(java.util.Arrays.equals(baos.toByteArray, dist),
      "BloomFilterAggregate no longer clamps to the runtime.bloomFilter confs " +
        "— revisit CorpusFilters.bloomSizing's pre-clamp")
  }

  test("operator == mirror ABOVE the conf clamp boundary") {
    // ~60 test-split grams with the item cap forced below that, so the
    // effective sizing is conf-clamped on both sides; any formula drift
    // between bloomDecontaminate and BloomMirror diverges loudly here.
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text").limit(400).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toIndexedSeq
    val (maxI, maxB) = (1024L, 4096L) // item floor == cap; tiny saturating filter
    val got = withLowBloomConfs(maxI, maxB) {
      val df = graft.operators.Sampling.deterministicSplit(
        docs.toDF("doc_id", "text"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      val train = df.filter($"split" === "train")
      val test = df.filter($"split" === "test")
      CorpusFilters.bloomDecontaminate(train, test, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
    }
    val want = BloomMirror.recompute(docs,
      confMaxItems = maxI, confMaxBits = maxB)
    assert(want.exists(_._3 > 0), "tiny clamped filter should flag something")
    assert(got == want,
      "operator and mirror must agree on the conf-clamped sizing")
  }

  test("sharded build above one filter's capacity: operator == mirror " +
      "across the shard boundary, and the design FP rate is restored") {
    // Lowered confs so a ~4k-gram test split needs MULTIPLE cap-sized
    // filters: capacity = min(500, 16384/15) = 500 -> 8 shards. The train
    // side uses a DISJOINT vocabulary, so every flagged doc is a false
    // positive by construction — a single clamped filter (maxShards = 1,
    // yesterday's behavior) saturates (~100% FP), the sharded bank must
    // come back to the ~bitsPerItem design rate (~0 of 200 docs).
    val (maxI, maxB) = (500L, 16384L)
    val docs = (0L until 2000L).map { id =>
      val vocab = if (BloomMirror.splitOf(id) == "test") "t" else "w"
      (id, (0 until 40).map(i => s"$vocab${id}x$i").mkString(" "))
    }
    val nShards = CorpusFilters.bloomShardCount(
      occurrences = docs.count(d => BloomMirror.splitOf(d._1) == "test") * 38L,
      bitsPerItem = 15, maxBits = 1L << 27,
      confMaxItems = maxI, confMaxBits = maxB, maxShards = 64)
    assert(nShards > 1, s"scenario must cross the shard boundary, got $nShards")
    val (gotSharded, gotSingle) = withLowBloomConfs(maxI, maxB) {
      val df = graft.operators.Sampling.deterministicSplit(
        docs.toDF("doc_id", "text"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      val train = df.filter($"split" === "train")
      val test = df.filter($"split" === "test")
      def run(maxShards: Int) =
        CorpusFilters.bloomDecontaminate(train, test, "doc_id", "text",
            maxShards = maxShards)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
          .sortBy(_._1).toSeq
      (run(64), run(1))
    }
    val want = BloomMirror.recompute(docs, confMaxItems = maxI, confMaxBits = maxB)
    assert(gotSharded == want,
      "operator and mirror must agree bit-for-bit across the shard boundary")
    val fpSharded = gotSharded.count(_._4)
    val fpSingle = gotSingle.count(_._4)
    // per-gram design FP here is ~6e-4 (486 occ in 7500 bits, k=10); at
    // 38 probed grams/doc that is ~2.3% of docs — allow 2x headroom
    assert(fpSharded <= gotSharded.size / 20,
      s"sharded bank should restore the design FP rate, got $fpSharded of ${gotSharded.size}")
    assert(fpSingle > gotSingle.size / 2,
      s"the single clamped filter should saturate here (the regime sharding fixes), got $fpSingle")
    // mirror honors maxShards identically (the capped-degradation path)
    assert(gotSingle == BloomMirror.recompute(docs,
      confMaxItems = maxI, confMaxBits = maxB, maxShards = 1))
  }

  test("broadcast-variable shards == literal CASE chain byte-for-byte " +
      "across the literalMaxShards boundary") {
    // same 8-shard scenario as above; run the probe once with every
    // shard as a plan literal (literalMaxShards = 64) and once through
    // the ONE-broadcast ShardedBloomProbe path (default, 8 > 4) — the
    // bitsets and keying are identical, so every flag (including false
    // positives) must match exactly
    val (maxI, maxB) = (500L, 16384L)
    val docs = (0L until 1500L).map { id =>
      val vocab = if (BloomMirror.splitOf(id) == "test") "t" else "w"
      (id, (0 until 40).map(i => s"$vocab${id}y$i").mkString(" "))
    }
    val (viaBroadcast, viaLiterals) = withLowBloomConfs(maxI, maxB) {
      val df = graft.operators.Sampling.deterministicSplit(
        docs.toDF("doc_id", "text"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      val train = df.filter($"split" === "train")
      val test = df.filter($"split" === "test")
      def run(literalMaxShards: Int) =
        CorpusFilters.bloomDecontaminate(train, test, "doc_id", "text",
            literalMaxShards = literalMaxShards)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
          .sortBy(_._1).toSeq
      (run(4), run(64))
    }
    assert(viaBroadcast == viaLiterals,
      "broadcast shard probe must reproduce the literal path exactly")
    assert(viaBroadcast == BloomMirror.recompute(docs,
      confMaxItems = maxI, confMaxBits = maxB),
      "and both must equal the straight-line mirror")
  }

  test("distributed q141 reproduces the straight-line mirror at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toIndexedSeq
    val want = BloomMirror.recompute(docs)
    assert(want.nonEmpty && want.exists(_._4), "corpus should have real contamination")
    val got = Queries.bloomDecontamination(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == want)
  }
}
