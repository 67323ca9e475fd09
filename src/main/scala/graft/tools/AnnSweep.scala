package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Dev utility: measured recall/timing curves for the ANN paths at
  * 1M-vector scale — the evidence behind `lshTopK`'s (tables, bits)
  * guidance and `nearDupPairs`'s adaptive bit sizing (results recorded in
  * SCALE.md §ANN).
  *
  * Ground truth is the exact [[Knn.bruteForceTopK]] over the full corpus
  * (feasible: 100 broadcast queries × n streamed rows); recall@5 is then
  * computed per LSH configuration, and the near-dup self-join is run at
  * three corpus sizes with planted identical-vector triplets to verify
  * the adaptive rule keeps candidates ~linear while recovering every
  * planted pair.
  *
  * Usage: runMain graft.tools.AnnSweep [nVecs] (default 1000000)
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // hash-derived 64-dim vectors (same generator as ScaleSmoke)
    val vecs = spark.range(nVecs.toLong)
      .withColumn("embedding", transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64($"id", i), lit(2000L)) - 1000.0) / 1000.0))
      .select($"id".as("vec_id"), $"embedding")
    vecs.cache(); vecs.count()
    val queries = vecs.filter($"vec_id" < 100).cache()
    queries.count()

    // Planted neighbors in two cosine bands, ground-truthed by exact
    // brute force (true top-10 per query = 5 dup-band + 5 similar-band):
    //  - DUP band (ids 3e8+): jitter ±0.05/coord → cosine ≈ 0.999, the
    //    near-duplicate regime nearDupPairs targets — any reasonable
    //    (tables, bits) must recover ~all of it.
    //  - SIMILAR band (ids 4e8+): jitter ±0.48/coord → cosine ≈ 0.90
    //    (θ≈26°, per-table collision (1-θ/π)^bits decays fast) — the
    //    regime where the bits/tables tradeoff actually bites; this is
    //    the measured curve the scaladoc guidance rests on.
    def planted(offset: Long, amp: Double) = queries
      .select(explode(sequence(lit(1), lit(5))).as("j"), $"vec_id", $"embedding")
      .select(($"vec_id" * 5 + $"j" + lit(offset)).as("vec_id"),
        transform($"embedding",
          (x, i) => x + (pmod(xxhash64($"vec_id", $"j", i), lit(1000L)) - 500.0)
            * (amp / 500.0)).as("embedding"))
    val corpus = vecs
      .unionByName(planted(300000000L, 0.05))
      .unionByName(planted(400000000L, 0.48))
      .cache()
    corpus.count()

    val (truthRows, tBrute) = timed {
      Knn.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
        .select($"qid", $"nid").collect()
    }
    val truth = truthRows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def bandCount(ids: Iterable[Long], lo: Long, hi: Long): Int =
      ids.count(id => id >= lo && id < hi)
    val truthIds = truth.valuesIterator.flatten.toSeq
    val nDup = bandCount(truthIds, 300000000L, 400000000L)
    val nSim = bandCount(truthIds, 400000000L, Long.MaxValue)
    println(f"[ann] brute-force ground truth ($nVecs%,d+1000 vectors, 100 queries, k=10): " +
      f"$tBrute%.1f s  (true top-10 membership: dup=$nDup%d/500 similar=$nSim%d/500)")

    // --- LSH (tables, bits) sweep: per-band recall@10 + wall time
    for ((tables, bits) <- Seq((8, 10), (8, 12), (8, 14), (16, 12), (16, 14), (16, 16))) {
      val (rows, t) = timed {
        Knn.lshTopK(corpus, queries, "vec_id", "embedding", 10,
            tables = tables, bits = bits)
          .select($"qid", $"nid").collect()
      }
      val got = rows.groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val hits = truth.toSeq.map { case (q, ts) => (ts & got.getOrElse(q, Set.empty)) }
      val recall = hits.map(_.size).sum.toDouble / truth.valuesIterator.map(_.size).sum
      val dupRecall = bandCount(hits.flatten, 300000000L, 400000000L).toDouble / math.max(1, nDup)
      val simRecall = bandCount(hits.flatten, 400000000L, Long.MaxValue).toDouble / math.max(1, nSim)
      println(f"[ann] lshTopK tables=$tables%2d bits=$bits%2d: recall@10=$recall%.3f " +
        f"(dup band: $dupRecall%.3f, similar band: $simRecall%.3f)  $t%.1f s")
    }

    // --- IVF (nCells, nProbe) sweep: the recall/cost trade behind the
    // defaults. Cells shrink as nCells grows (cheaper probes) but the
    // true neighbors spread over more cells, so recall needs nProbe to
    // grow with nCells — the measured curve picks the knee.
    for ((nCells, nProbe) <- Seq((64, 4), (64, 8), (64, 16),
        (256, 8), (256, 16), (256, 32), (1024, 32))) {
      val (rows, t) = timed {
        Knn.ivfTopK(corpus, queries, "vec_id", "embedding", 10,
            nCells = nCells, nProbe = nProbe)
          .select($"qid", $"nid").collect()
      }
      val got = rows.groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val hits = truth.toSeq.map { case (q, ts) => (ts & got.getOrElse(q, Set.empty)) }
      val recall = hits.map(_.size).sum.toDouble / truth.valuesIterator.map(_.size).sum
      val dupRecall = bandCount(hits.flatten, 300000000L, 400000000L).toDouble / math.max(1, nDup)
      val simRecall = bandCount(hits.flatten, 400000000L, Long.MaxValue).toDouble / math.max(1, nSim)
      println(f"[ann] ivfTopK cells=$nCells%4d probe=$nProbe%2d: recall@10=$recall%.3f " +
        f"(dup band: $dupRecall%.3f, similar band: $simRecall%.3f)  $t%.1f s")
    }

    // --- nearDupPairs adaptive-bits curve: candidates stay ~linear, every
    // planted identical-vector pair is recovered, at growing n
    for (n <- Seq(nVecs / 8, nVecs / 4, nVecs)) {
      val base = vecs.filter($"vec_id" < n)
      val planted = base.filter($"vec_id" < 1000)
        .select(explode(array(lit(0L), lit(100000000L), lit(200000000L))).as("off"),
          $"vec_id", $"embedding")
        .select(($"vec_id" + $"off").as("vec_id"), $"embedding")
        .unionByName(base.filter($"vec_id" >= 1000))
      val adaptiveBits = math.min(20, math.max(10,
        math.ceil(math.log((n + 2000).toDouble / 8.0) / math.log(2.0)).toInt))
      val p999 = math.pow(1.0 - math.acos(0.999) / math.Pi, adaptiveBits)
      val adaptiveTables = math.min(32, math.max(2,
        math.ceil(math.log(0.01) / math.log(1.0 - p999)).toInt))
      val (found, t) = timed {
        Knn.nearDupPairs(planted, "vec_id", "embedding", minCosine = 0.999)
          .select($"id_a", $"id_b").collect()
      }
      val plantedFound = found.count(r =>
        r.getLong(0) % 100000000L == r.getLong(1) % 100000000L &&
          r.getLong(0) % 100000000L < 1000L)
      println(f"[ann] nearDupPairs n=${n + 2000}%,d (adaptive bits=$adaptiveBits tables=$adaptiveTables): " +
        f"pairs=${found.length}%,d plantedRecovered=$plantedFound%,d/3000  $t%.1f s")
    }

    // --- fixed-bits contrast at full n: what the adaptive rule avoids
    if (sys.env.contains("ANN_FIXED_BITS_BASELINE")) {
      val base = vecs
      val (found, t) = timed {
        Knn.nearDupPairs(base, "vec_id", "embedding", minCosine = 0.999, bits = 12)
          .count()
      }
      println(f"[ann] nearDupPairs n=$nVecs%,d FIXED bits=12: pairs=$found%,d  $t%.1f s")
    }
    spark.stop()
  }
}
