package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  // 1/2 exact dups; 3 near-dup of 1 (one word changed); 4/5 unrelated; 6
  // chains to 3 (transitivity)
  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy cat again and again today"),
      (4L, "completely different content about spark distributed query engines"),
      (5L, "yet another unrelated sentence mentioning parquet columnar storage"),
      (6L, "a quick brown fox jumps over the lazy cat again and again today")
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps lowest id per duplicate group") {
    import spark.implicits._
    val kept = Dedup.exact(fixture, "doc_id", Seq("text"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup.minhashCandidatePairs(fixture, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact duplicates must collide")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), "near-dup must surface")
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) && Set(a, b).contains(5L) },
      "unrelated docs must not pair")
    // identical texts ⇒ identical signatures ⇒ est_jaccard 1.0
    val exact = Dedup.minhashCandidatePairs(fixture, "doc_id", "text", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((1L, 2L)))
  }

  test("fuzzyClusters groups transitively with smallest-id labels") {
    val labels = Dedup.fuzzyClusters(fixture, "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L, "exact dups share cluster 1")
    assert(labels(3L) == 1L, "near-dup joins cluster 1")
    assert(labels(4L) == 4L && labels(5L) == 5L, "unrelated stay singleton")
  }

  test("simhash: near-dups within small hamming distance; banding finds them") {
    val hs = fixture.select(org.apache.spark.sql.functions.col("doc_id"),
      Dedup.simhashUdf(org.apache.spark.sql.functions.col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L), "identical text ⇒ identical simhash")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) <= 8, "near-dup ⇒ close simhash")
    assert(java.lang.Long.bitCount(hs(4L) ^ hs(5L)) > 8, "unrelated ⇒ distant simhash")

    val pairs = Dedup.simhashCandidatePairs(fixture, "doc_id", "text", maxDistance = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash verified pairs are invariant to the blocking scheme (m = 4/5/6) " +
      "and complete vs brute-force hamming") {
    import SparkSuiteBase.spark
    import spark.implicits._
    // collision-heavy corpus: small vocab, short docs, planted exact dups
    val rnd = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0L until 150L).map { i =>
      val base = Vector.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      i -> (if (i % 10 == 0) "aa bb cc dd ee ff gg" else base.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    def pairsWith(m: Int) =
      Dedup.simhashCandidatePairs(df, "doc_id", "text", maxDistance = 3, blocks = m)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val p4 = pairsWith(4)
    val p5 = pairsWith(5)
    val p6 = pairsWith(6)
    assert(p4 == p5 && p5 == p6,
      "pigeonhole guarantee: every scheme must yield the same verified pair set")
    // completeness: brute-force all-pairs hamming <= 3 on the driver
    val hashes = df.select($"doc_id", Dedup.simhashUdf($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      (ia, ha) <- hashes.toSeq; (ib, hb) <- hashes.toSeq if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(p4.keySet == brute, "banding must find exactly the brute-force set")
  }

  test("ngram jaccard is exact") {
    val pairs = Dedup.ngramJaccardPairs(fixture, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0, "identical texts ⇒ jaccard 1.0")
    // docs 1 and 3 differ in one word of 13 ⇒ 2 of the 12 bigrams change:
    // |A∩B| = 10, |A∪B| = 14 ⇒ 10/14
    assert(math.abs(pairs((1L, 3L)) - 10.0 / 14.0) < 1e-12)
  }

  test("ngram jaccard top-k (LSH-pruned) finds the same high pairs as exact") {
    val approx = Dedup.ngramJaccardTopK(fixture, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(approx((1L, 2L)) == 1.0)
    assert(math.abs(approx((1L, 3L)) - 10.0 / 14.0) < 1e-12,
      "exact jaccard must survive the candidate pruning")
  }

  test("connected components: chain propagates smallest id") {
    import spark.implicits._
    val vertices = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("connected components: a 1,000-link chain resolves to ONE cluster " +
      "within the O(log d) pointer-doubling budget") {
    import spark.implicits._
    // the templated-web-page shape: doc i near-dups doc i+1, diameter 1000
    // — a linear-propagation implementation needs 1000 rounds and used to
    // silently return a SPLIT clustering at its 10-round cap
    val n = 1001L
    val vertices = spark.range(n).toDF("id")
    val edges = spark.range(n - 1)
      .select($"id".as("id_a"), ($"id" + 1L).as("id_b"))
    // maxDriverEdges = 0 forces the distributed loop — the doubling
    // budget is the contract under test (the fast path never loops)
    val labels = Dedup.connectedComponents(vertices, edges,
        maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L),
      s"all $n chained vertices must share cluster 0; got ${labels.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("connected components: unconverged exit is loud, not a split clustering") {
    import spark.implicits._
    val vertices = spark.range(40L).toDF("id")
    val edges = spark.range(39L).select($"id".as("id_a"), ($"id" + 1L).as("id_b"))
    // maxDriverEdges = 0 forces the distributed hook/double loop — the
    // contract under test; the bounded union-find fast path solves this
    // graph exactly and never unconverges
    intercept[IllegalStateException] {
      Dedup.connectedComponents(vertices, edges, maxIter = 2,
        maxDriverEdges = 0L).collect()
    }
  }

  test("connected components: bounded union-find fast path matches the " +
      "distributed loop label-for-label (r17 optimization)") {
    import spark.implicits._
    // chain + star + isolated vertices + a cycle — every shape in one graph
    val vertices = spark.range(30L).toDF("id")
    val edges = (Seq((0L, 1L), (1L, 2L), (2L, 3L),        // chain → 0
      (10L, 11L), (10L, 12L), (10L, 13L),                  // star → 10
      (20L, 21L), (21L, 22L), (22L, 20L))                  // cycle → 20
      ).toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = Dedup.connectedComponents(vertices, edges,
        maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == loop)
    assert(fast(3L) == 0L && fast(13L) == 10L && fast(22L) == 20L &&
      fast(29L) == 29L)
  }

  test("reliable checkpoint dir produces identical clusters (Stage.cut contract)") {
    val base = Dedup.fuzzyClusters(fixture, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "suite session should start without one")
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    try {
      sc.setCheckpointDir(dir)
      val reliable = Dedup.fuzzyClusters(fixture, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(reliable == base)
      assert(new java.io.File(dir).exists)
    } finally {
      sc.setCheckpointDir(null) // Option(null) → None: restore local mode
      assert(sc.getCheckpointDir.isEmpty)
    }
  }

  test("minhash: single-exchange and join verification plans are bit-identical") {
    val docs = Tables(spark, SparkSuiteBase.sfDir, "documents")
      .selectExpr("cast(doc_id as long) as doc_id", "text")
    def run(threshold: Long) = Dedup.minhashCandidatePairs(
        docs, "doc_id", "text", threshold = 0.8,
        singleExchangeMinDocs = threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val joined = run(Long.MaxValue)  // small-corpus join forms
    val grouped = run(0L)            // big-corpus single-exchange forms
    assert(joined.nonEmpty)
    assert(joined == grouped,
      "the adaptive plan switch must not change a single output value")
  }
}
