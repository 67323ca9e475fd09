package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Knn

class KnnSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  private def emb = Tables(spark, sfDir, "embeddings")
  private def queries = {
    import spark.implicits._
    emb.filter($"vec_id" < 10)
  }

  test("brute force: k results per query, self excluded, scores descending") {
    val rows = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5).collect()
    assert(rows.length == 50)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(!rs.exists(_.getAs[Long]("nid") == q), "self must be excluded")
      val scores = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sorted.reverse))
    }
  }

  test("LSH recall@5 vs brute force is usable (>= 0.5 on sf0.001)") {
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = keyset(Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val approx = keyset(Knn.lshTopK(emb, queries, "vec_id", "embedding", k = 5))
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"LSH recall@5 = $recall%.2f (candidates verified exactly)")
    assert(recall >= 0.5, f"recall $recall%.2f too low")
  }

  test("LSH is deterministic (hash-derived hyperplanes, no RNG state)") {
    val a = Knn.lshTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk"), r.getAs[Long]("nid"))).toSet
    val b = Knn.lshTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk"), r.getAs[Long]("nid"))).toSet
    assert(a == b)
  }

  test("IVF recall@5 vs brute force is usable (>= 0.5 on sf0.001) and deterministic") {
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = keyset(Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    val a = keyset(Knn.ivfTopK(emb, queries, "vec_id", "embedding", k = 5))
    val b = keyset(Knn.ivfTopK(emb, queries, "vec_id", "embedding", k = 5))
    assert(a == b, "IVF must be deterministic (fixed init, fixed iterations)")
    val recall = (exact & a).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.2f (nProbe=4/16 cells)")
    assert(recall >= 0.5, f"recall $recall%.2f too low")
  }

  test("nearDupClusters groups planted duplicate vectors") {
    import spark.implicits._
    // 3 groups of identical vectors (cosine 1.0) + unrelated singletons
    val base = emb.limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val planted = base.take(3).flatMap { case (id, v) =>
      Seq((id, v), (id + 1000L, v), (id + 2000L, v))
    } ++ base.drop(3).map { case (id, v) => (id + 5000L, v) }
    val df = planted.toSeq.toDF("vec_id", "embedding")
    val clusters = Knn.nearDupClusters(df, "vec_id", "embedding", minCosine = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.take(3).foreach { case (id, _) =>
      assert(clusters(id) == id && clusters(id + 1000L) == id && clusters(id + 2000L) == id,
        s"planted triplet of $id must share cluster $id")
    }
    base.drop(3).foreach { case (id, _) =>
      assert(clusters(id + 5000L) == id + 5000L, s"singleton ${id + 5000L} must stay alone")
    }
  }

  test("topSimilarPairs: ordered, deduped, id_a < id_b") {
    val rows = Knn.topSimilarPairs(emb, "vec_id", "embedding", 10).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
  }
}
