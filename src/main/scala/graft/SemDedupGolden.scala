package graft

/** Constructed-truth golden for the SemDeDup operator (q137): a 49-vector
  * corpus — 40 well-separated hash-derived 16-dim base vectors plus three
  * planted semantic-duplicate groups (a triple, a pair, a quad of
  * near-identical vectors) — where the expected dedup output is derivable
  * WITHOUT the Spark operator: [[expected]] computes exact all-pairs
  * cosine in straight-line JVM arithmetic, takes edges ≥ the 0.999
  * threshold, and labels smallest-id connected components.
  *
  * The construction margin does the same work as in [[AnnGolden]]: group
  * members differ by a +1 nudge on one coordinate of a ±1000-scale vector
  * (pairwise cosine ≈ 1 − 1e-7) while every cross-group pair sits far
  * below the threshold (both margins asserted by `SemDedupSpec`), so
  * members of a group are near-collinear and land in the SAME k-means
  * cell for any centroid set the deterministic trainer can produce —
  * within-cell pruning therefore finds every planted edge, and the
  * operator must reproduce the mirror exactly: recall is 1 by
  * construction, not by tuning.
  */
object SemDedupGolden {

  val Dim = 16

  /** Deterministic pseudo-random coordinate in [-1000, 1000): a fixed
    * integer mix (splitmix64 finalizer) of (id, coordinate). */
  private def coord(id: Long, k: Int): Float = {
    var z = id * 0x9E3779B97F4A7C15L + k * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (Math.floorMod(z, 2000L) - 1000L).toFloat
  }

  private def baseVec(seed: Long): Array[Float] =
    Array.tabulate(Dim)(k => coord(seed, k))

  /** Planted groups: (member ids, generator seed). Member j nudges
    * coordinate j by +1 — near-identical, mutually distinct vectors. */
  val groups: Seq[(Seq[Long], Long)] = Seq(
    (Seq(100L, 101L, 102L), 1000L),
    (Seq(110L, 111L), 1001L),
    (Seq(120L, 121L, 122L, 123L), 1002L))

  /** (vec_id, embedding): ids 0..39 are singleton base vectors. */
  lazy val vectors: Seq[(Long, Seq[Float])] = {
    val base = (0L until 40L).map(id => id -> baseVec(id).toSeq)
    val planted = groups.flatMap { case (ids, seed) =>
      ids.zipWithIndex.map { case (id, j) =>
        val v = baseVec(seed)
        v(j) = v(j) + 1.0f
        id -> v.toSeq
      }
    }
    base ++ planted
  }

  val Threshold = 0.999

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact pairwise cosine for every id pair (spec margin assertions). */
  lazy val allCosines: Seq[(Long, Long, Double)] = {
    val vs = vectors
    for { (ia, va) <- vs; (ib, vb) <- vs if ia < ib }
      yield (ia, ib, cosine(va, vb))
  }

  /** Expected (vec_id, cluster_id, keep) under the min_id keep rule —
    * exact-cosine edges ≥ [[Threshold]], smallest-id components. */
  lazy val expected: Seq[(Long, Long, Boolean)] = {
    val ids = vectors.map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    allCosines.foreach { case (a, b, c) =>
      if (c >= Threshold) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    ids.sorted.map(i => (i, find(i), find(i) == i))
  }

  /** DuckDB-runnable oracle for q137. */
  lazy val oracleValuesSql: String =
    expected.map { case (i, c, k) => s"($i, $c, $k)" }.mkString(
      "SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cluster_id AS BIGINT) AS cluster_id, keep " +
        "FROM (VALUES ",
      ", ",
      ") AS g(vec_id, cluster_id, keep) ORDER BY vec_id")
}
