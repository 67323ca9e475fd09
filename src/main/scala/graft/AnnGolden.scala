package graft

/** Constructed-truth golden for the ANN operator family (q126): a fixed
  * 45-vector corpus (40 hash-derived 16-dim base vectors + 5 planted
  * near-identical duplicates of the query vectors) where the expected
  * answers are derivable WITHOUT the Spark operators — [[expectedTopK]]
  * is the exact-cosine argmax computed in straight-line JVM arithmetic,
  * and the construction margin (planted cosine ≈ 0.99999996 vs every
  * other pair far below — asserted by `AnnGoldenSpec`) makes the LSH,
  * IVF and near-dup-pair paths all provably return it: a vector pair
  * this collinear collides in every random-hyperplane table and lands in
  * the same IVF cell, so recall of the planted neighbor is 1 by
  * construction, not by tuning.
  *
  * Puts `Knn.lshTopK` (q38 family), `Knn.ivfTopK` (q42) and
  * `Knn.nearDupPairs` (q50's edge generator) on the driver's
  * DuckDB-checked oracle surface; the SF-dependent queries stay rows-only
  * with recall specs.
  */
object AnnGolden {

  val Dim = 16
  val NumBase = 40
  val NumQueries = 5
  val PlantedOffset = 100L

  /** Deterministic pseudo-random coordinate in [-1000, 1000): a fixed
    * integer mix (splitmix64 finalizer) of (id, coordinate). */
  private def coord(id: Long, k: Int): Float = {
    var z = id * 0x9E3779B97F4A7C15L + k * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (Math.floorMod(z, 2000L) - 1000L).toFloat
  }

  private def baseVec(id: Long): Array[Float] =
    Array.tabulate(Dim)(k => coord(id, k))

  /** (vec_id, embedding): 40 base vectors; ids 100..104 are the planted
    * near-duplicates of queries 0..4 (one coordinate nudged by +1 on a
    * ±1000 scale ⇒ cosine ≈ 1 − 1e-7). */
  lazy val vectors: Seq[(Long, Seq[Float])] = {
    val base = (0L until NumBase.toLong).map(id => id -> baseVec(id).toSeq)
    val planted = (0L until NumQueries.toLong).map { q =>
      val v = baseVec(q)
      v(0) = v(0) + 1.0f
      (PlantedOffset + q) -> v.toSeq
    }
    base ++ planted
  }

  /** Query ids (a subset of the corpus; operators exclude self-matches). */
  val queryIds: Seq[Long] = (0L until NumQueries.toLong).toSeq

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact top-1 neighbor per query by brute-force cosine in plain JVM —
    * the independent ground truth (ties broken by lowest id, matching the
    * operators' contract; the construction margin means no tie occurs). */
  lazy val expectedTopK: Seq[(Long, Long)] = {
    val all = vectors.toMap
    queryIds.map { q =>
      val qv = all(q)
      val best = vectors.filter(_._1 != q)
        .map { case (id, v) => (id, cosine(qv, v)) }
        .maxBy { case (id, s) => (s, -id.toDouble) }
      q -> best._1
    }
  }

  /** Exact pairs with cosine ≥ 0.999 among all 45 vectors (id_a < id_b) —
    * the near-dup ground truth (= exactly the 5 planted pairs). */
  lazy val expectedPairs: Seq[(Long, Long)] = {
    val vs = vectors
    (for {
      (ia, va) <- vs; (ib, vb) <- vs if ia < ib
      if cosine(va, vb) >= 0.999
    } yield (ia, ib)).sorted
  }

  /** DuckDB-runnable oracle for q126: the method-tagged union of the
    * JVM-exact expectations. */
  lazy val oracleValuesSql: String = {
    val rows =
      expectedTopK.map { case (q, n) => s"('lsh', $q, $n)" } ++
        expectedTopK.map { case (q, n) => s"('ivf', $q, $n)" } ++
        expectedPairs.map { case (a, b) => s"('pairs', $a, $b)" }
    rows.mkString(
      "SELECT method, CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b " +
        "FROM (VALUES ",
      ", ",
      ") AS g(method, id_a, id_b) ORDER BY method, id_a, id_b")
  }
}
