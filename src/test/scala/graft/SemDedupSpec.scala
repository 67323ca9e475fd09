package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Knn

/** SemDeDup operator (q137): construction-margin assertions for the
  * golden fixture, distributed-vs-mirror equality for the min_id keep
  * rule, and a hand-derived single-cell fixture for the paper's
  * low_centroid keep rule (whose expected value depends on the trained
  * centroid and so cannot live in a VALUES oracle). */
class SemDedupSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  test("fixture margins: planted groups cohere, everything else is far") {
    val members = SemDedupGolden.groups.flatMap(_._1).toSet
    val sameGroup = SemDedupGolden.groups.flatMap { case (ids, _) =>
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    SemDedupGolden.allCosines.foreach { case (a, b, c) =>
      if (sameGroup((a, b)))
        assert(c >= 0.9999, s"within-group pair ($a,$b) cosine $c")
      else
        assert(c <= 0.99, s"cross pair ($a,$b) cosine $c too close to threshold")
    }
    // expected structure: every group collapses to its min id, all 40
    // base vectors stay singletons
    val exp = SemDedupGolden.expected.map(e => e._1 -> e._2).toMap
    SemDedupGolden.groups.foreach { case (ids, _) =>
      ids.foreach(i => assert(exp(i) == ids.min, s"member $i of group $ids"))
    }
    (0L until 40L).foreach(i => assert(exp(i) == i, s"base $i not singleton"))
    assert(members.size == 9 && SemDedupGolden.expected.size == 49)
  }

  test("distributed semDedup (min_id) reproduces the exact-cosine mirror") {
    import spark.implicits._
    val got = Queries.semDedupGolden(spark, SparkSuiteBase.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == SemDedupGolden.expected)
  }

  test("low_centroid keep rule keeps the least prototypical member") {
    import spark.implicits._
    // One cell; centroid converges to the mean of all three vectors,
    // (10, -2/3). Cosines to it: a≈0.99778 > b≈0.98621 > c≈0.97482, with
    // ~1e-2 gaps (no float-noise sensitivity). All three pairwise cosines
    // clear the 0.92 threshold, so they form ONE component; the paper's
    // rule must keep c — min_id would keep a.
    val vecs = Seq(
      (1L, Seq(10.0f, 0.0f)),   // a
      (2L, Seq(10.0f, 1.0f)),   // b
      (3L, Seq(10.0f, -3.0f)))  // c
      .toDF("vec_id", "embedding")
    val out = Knn.semDedup(vecs, "vec_id", "embedding",
        minCosine = 0.92, nCells = 1, keepRule = "low_centroid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 1L, 1L), "one component labeled by min id")
    assert(out.map(_._3).toSeq == Seq(false, false, true),
      "low_centroid keeps the member farthest from the centroid")
  }

  test("planted duplicates on the real sf0.001 embeddings are recovered") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 20 planted near-identical copies (ids 10000+i of ids i) on top of the
    // 500-vector real corpus: each copy must fall to its original under
    // min_id; the 480 untouched vectors must stay kept (the corpus has no
    // natural pairs at cosine ≥ 0.999 — verified by the count assertion).
    val base = Tables(spark, SparkSuiteBase.sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val copies = base.filter($"vec_id" < 20)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"embedding", x => x + lit(1e-4f)).as("embedding"))
    val out = Knn.semDedup(base.unionByName(copies), "vec_id", "embedding",
        minCosine = 0.999, nCells = 8, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 520)
    (0L until 20L).foreach { i =>
      val copy = out.find(_._1 == 10000L + i).get
      assert(copy._2 == i && !copy._3, s"copy of $i must dedup to it")
      val orig = out.find(_._1 == i).get
      assert(orig._2 == i && orig._3, s"original $i must be kept")
    }
    assert(out.count(_._3) == 500, "exactly the 500 originals survive")
  }

  test("null/empty/zero embeddings are degenerate singleton keeps") {
    import spark.implicits._
    val hostile = Seq(
      (1L, Seq(10.0f, 0.0f)),
      (2L, Seq(10.0f, 0.001f)),            // dups with 1
      (3L, null.asInstanceOf[Seq[Float]]), // null embedding
      (4L, Seq.empty[Float]),              // empty embedding
      (5L, Seq(0.0f, 0.0f))                // zero norm: NaN cosine, no edge
    ).toDF("vec_id", "embedding")
    val out = Knn.semDedup(hostile, "vec_id", "embedding",
        minCosine = 0.999, nCells = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, true), (2L, 1L, false),
      (3L, 3L, true), (4L, 4L, true), (5L, 5L, true)))
  }

  test("keepRule is validated") {
    import spark.implicits._
    val vecs = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Knn.semDedup(vecs, "vec_id", "embedding", 0.9, keepRule = "nope")
    }
  }
}
