package graft

/** Straight-line JVM mirror of q42 (IVF approximate kNN) for the
  * SF-scale DuckDB oracle. Possible since round 9 moved the Lloyd loop
  * driver-side ([[operators.Knn.trainCentroids]]): with per-cell means
  * folded in ascending-id order, the whole IVF pipeline — md5-bucket
  * training sample, first-`nCells`-by-id init, Lloyd iterations, cell
  * assignment, probe selection, `graft_dot` cosine rerank — is a pure
  * function of the vector corpus. This mirror re-derives every selected
  * row from that published contract through independent imperative code
  * (same IEEE operation order per scalar), never the DataFrame plan
  * under test.
  */
object IvfMirror {

  /** Left-to-right IEEE dot product — `graft_dot`'s summation order. */
  private def dotAsc(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def nearestCell(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var dist = 0.0; var i = 0
      val cv = cs(c)
      while (i < v.length) { val t = v(i) - cv(i); dist += t * t; i += 1 }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }

  /** The `trainCentroids` contract: bounded md5-hash sample, init = first
    * nCells by id, Lloyd with ascending-id mean folds. */
  private[graft] def trainCentroids(vecs: IndexedSeq[(Long, Array[Double])],
      nCells: Int, iterations: Int): Array[Array[Double]] = {
    val n = vecs.size.toLong
    val sampleCap = nCells.toLong * 100L
    val sample: Array[Array[Double]] =
      (if (n <= sampleCap) vecs
       else {
         val frac = sampleCap.toDouble / n
         vecs.filter { case (id, _) => MirrorHash.inHashSample(id, frac) }
       }).sortBy(_._1).map(_._2).toArray
    if (sample.isEmpty) return Array.empty
    var centroids: Array[Array[Double]] = sample.take(nCells)
    val dim = centroids(0).length
    var iter = 0
    while (iter < iterations) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val cnts = new Array[Long](nCells)
      sample.foreach { v =>
        val best = nearestCell(v, centroids)
        cnts(best) += 1L
        val s = sums(best)
        var i = 0
        while (i < dim && i < v.length) { s(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (cnts(c) == 0L) centroids(c)
        else {
          val s = sums(c); val m = new Array[Double](dim)
          var i = 0
          while (i < dim) { m(i) = s(i) / cnts(c); i += 1 }
          m
        }
      }.toArray
      iter += 1
    }
    centroids
  }

  /** q42 contract: `Knn.ivfTopK(emb, emb.filter(vec_id < maxQid), k = 5)`
    * with the defaults (nCells 16, nProbe 4, iterations 5).
    * Returns (qid, rnk, nid, score).
    *
    * `trainFilter` restricts which ids the quantizer TRAINS on (q160's
    * append contract: centroids come from the build half only, while
    * assignment and scoring cover the whole corpus); the default trains
    * on everything — the q42/q158 contract unchanged.
    *
    * `qidFilter` (when non-null) REPLACES the `vec_id < maxQid` query
    * selection — q169's hybrid-retrieval batch is every 50th vector,
    * matching the BM25 side's every-50th-document query batch.
    *
    * `candidateFilter` restricts which ids may appear as NEIGHBORS
    * while training/assignment/queries stay corpus-wide — the contract
    * of both `Knn.deleteFromIvfIndex` tombstones (q172: the quantizer
    * was trained before the deletes; deleted vectors leave the
    * candidate set only) and `Knn.ivfTopKAgainstIndex(candidateFilter)`
    * metadata-filtered search (q173). */
  def recompute(vecs: IndexedSeq[(Long, Array[Double])], maxQid: Long = 10L,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4,
      iterations: Int = 5,
      trainFilter: Long => Boolean = _ => true,
      qidFilter: Long => Boolean = null,
      candidateFilter: Long => Boolean = _ => true): Seq[(Long, Int, Long, Double)] = {
    val centroids = trainCentroids(
      vecs.filter { case (id, _) => trainFilter(id) }, nCells, iterations)
    if (centroids.isEmpty) return Seq.empty
    val norm = vecs.map { case (id, v) => id -> math.sqrt(dotAsc(v, v)) }.toMap
    val cellOf = vecs.map { case (id, v) => id -> nearestCell(v, centroids) }.toMap
    val byCell = vecs.groupBy { case (id, _) => cellOf(id) }

    val isQ: Long => Boolean =
      if (qidFilter != null) qidFilter else (_ < maxQid)
    vecs.filter(v => isQ(v._1)).sortBy(_._1).flatMap { case (qid, qv) =>
      // probesUdf: nProbe nearest cells by (squared distance, cell id)
      val probes = centroids.indices.map { c =>
        var dist = 0.0; var i = 0
        val cv = centroids(c)
        while (i < qv.length) { val t = qv(i) - cv(i); dist += t * t; i += 1 }
        (dist, c)
      }.sorted.take(nProbe).map(_._2)
      val cand = probes.flatMap(c => byCell.getOrElse(c, Seq.empty))
        .filter(_._1 != qid)
        .filter(c => candidateFilter(c._1))
      // Spark's rank window orders (score desc, id asc) with NaN as the
      // LARGEST value and -0.0 = 0.0 — a zero-norm vector's NaN cosine
      // must rank first here too (MirrorHash.scoreDescIdAsc), not last
      // as Scala's total ordering would put it
      cand.map { case (id, v) =>
        (id, dotAsc(qv, v) / (norm(qid) * norm(id)))
      }.sorted(MirrorHash.scoreDescIdAsc)
        .take(k).zipWithIndex
        .map { case ((id, s), r) => (qid, r + 1, id, s) }
    }
  }

  /** The SQ8-quantized probe's published contract
    * ([[operators.Knn.quantizeIvfIndex]] +
    * [[operators.Knn.ivfTopKAgainstIndexSq8]]), re-derived through
    * independent imperative code: the SAME deterministic quantizer and
    * cell pruning as [[recompute]], but candidates are scored as
    * cosine(query, RECONSTRUCTION) where each dimension is affine
    * byte-quantized against exact per-dim corpus (min, max) —
    * `code = clamp(round((x − min)/step), 0, 255)`,
    * `recon = min + code·step`, `step = (max − min)/255` (0 when the
    * dimension is constant) — with `math.round`'s
    * half-up-for-non-negative matching the operator's build UDF
    * bit-for-bit and left-to-right IEEE sums matching
    * [[graft.expressions.Sq8Dot]]/[[graft.expressions.Sq8NormSq]]. */
  def recomputeSq8(vecs: IndexedSeq[(Long, Array[Double])],
      maxQid: Long = 10L, k: Int = 5, nCells: Int = 16, nProbe: Int = 4,
      iterations: Int = 5,
      trainFilter: Long => Boolean = _ => true,
      paramFilter: Long => Boolean = _ => true,
      candidateFilter: Long => Boolean = _ => true,
      qidFilter: Long => Boolean = null): Seq[(Long, Int, Long, Double)] = {
    val centroids = trainCentroids(
      vecs.filter { case (id, _) => trainFilter(id) }, nCells, iterations)
    if (centroids.isEmpty) return Seq.empty
    // params derive from the population quantizeIvfIndex SAW (the build
    // half when appends arrive later — frozen-quantizer semantics);
    // appended components outside [min, max] clamp to the byte edges
    val pvecs = vecs.filter { case (id, _) => paramFilter(id) }
    val dim = vecs.map(_._2.length).max
    val mins = Array.tabulate(dim)(d =>
      pvecs.iterator.filter(_._2.length > d).map(_._2(d)).min)
    val maxs = Array.tabulate(dim)(d =>
      pvecs.iterator.filter(_._2.length > d).map(_._2(d)).max)
    val steps = Array.tabulate(dim)(d =>
      if (maxs(d) > mins(d)) (maxs(d) - mins(d)) / 255.0 else 0.0)
    def recon(v: Array[Double]): Array[Double] =
      Array.tabulate(v.length) { i =>
        val code =
          if (steps(i) == 0.0) 0
          else math.min(255L, math.max(0L,
            math.round((v(i) - mins(i)) / steps(i)))).toInt
        mins(i) + code * steps(i)
      }
    val reconOf = vecs.map { case (id, v) => id -> recon(v) }.toMap
    val qnorm = vecs.map { case (id, v) => id -> math.sqrt(dotAsc(v, v)) }.toMap
    val cellOf = vecs.map { case (id, v) => id -> nearestCell(v, centroids) }.toMap
    val byCell = vecs.map(_._1).groupBy(cellOf)
    val isQ: Long => Boolean =
      if (qidFilter != null) qidFilter else (_ < maxQid)
    vecs.filter(v => isQ(v._1)).sortBy(_._1).flatMap { case (qid, qv) =>
      val probes = centroids.indices.map { c =>
        var dist = 0.0; var i = 0
        val cv = centroids(c)
        while (i < qv.length) { val t = qv(i) - cv(i); dist += t * t; i += 1 }
        (dist, c)
      }.sorted.take(nProbe).map(_._2)
      val cand = probes.flatMap(c => byCell.getOrElse(c, Seq.empty))
        .filter(_ != qid)
        .filter(candidateFilter)
      cand.map { id =>
        val r = reconOf(id)
        (id, dotAsc(qv, r) / (qnorm(qid) * math.sqrt(dotAsc(r, r))))
      }.sorted(MirrorHash.scoreDescIdAsc)
        .take(k).zipWithIndex
        .map { case ((id, s), rr) => (qid, rr + 1, id, s) }
    }
  }
}
