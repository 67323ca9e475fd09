package graft

import scala.collection.mutable

import org.apache.spark.unsafe.types.UTF8String

import graft.dict.TitleDictionary
import graft.text.Tokenize

/** Straight-line JVM mirror of the GENERIC similarity-join queries at SF
  * scale — q46 (`SimilarityJoin.topKAgainst`, absolute df cap 50) and q49
  * (`SimilarityJoin.thresholdJoin`, τ = 0.3, fractional df cap 0.05) with
  * the BLS alias corpus as the right side.
  *
  * These two were the last candidate-machine queries stuck rows-only:
  * their winners ride on per-doc norm² and per-pair dot-product sums
  * that a distributed plan merges in nondeterministic partial order.
  * Round 9 made the operators deterministic (every cross-partition float
  * aggregation rounds its addends to e9 fixed-point BIGINT before
  * summing — integer addition is order-proof), so each title's winner is
  * now a pure function of the title text and the static right side. This
  * mirror replays that contract through independent imperative code
  * (never the DataFrame plan under test): same IEEE operation order per
  * scalar, same `(x·1e9 + 0.5)::long` fixed-point map, same prefix-filter
  * ordering (qw_e9 desc, term asc in UTF-8 binary order), same
  * smaller-side sorted-fold sparse dot as the scoring UDF.
  */
object SimJoinSfMirror {

  /** Spark `round(double)` → `cast(long)` semantics: HALF_UP via
    * `BigDecimal.valueOf` (canonical string repr), then truncate. Used by
    * [[DsirMirror]] for λ/Gumbel values (which can be negative). */
  private[graft] def sparkRoundToLong(x: Double): Long =
    if (x.isNaN || x.isInfinite) x.toLong
    else java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue.toLong

  /** The similarity operators' cheap fixed-point map for NONNEGATIVE
    * values: `(x + 0.5)::long` (floor(x+0.5) = HALF_UP for x ≥ 0, pure
    * codegen arithmetic — no BigDecimal in the hot path). */
  private[graft] def halfUpNonNeg(x: Double): Long = (x + 0.5).toLong

  /** Spark string sort order (UTF-8 binary), used by the prefix window's
    * `$"term".asc` tie-break. */
  private val utf8Ord: Ordering[String] =
    (a: String, b: String) => UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  // ------------------------------------------------- static right side
  // q46/q49 build the right DataFrame as corpus.zipWithIndex, so rid = i.

  private lazy val corpus: Array[String] = TitleDictionary.corpus
  private lazy val numDocs: Int = corpus.length

  private lazy val rToks: Array[Array[String]] = corpus.map(Tokenize.tokenizeAndStem)

  /** df counts every alias containing the term at least once. */
  private lazy val df: Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    rToks.foreach(_.distinct.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L)))
    m.toMap
  }

  /** idf = ln(N/df) — `log(lit(numDocs.toDouble) / $"df")`. */
  private lazy val idf: Map[String, Double] =
    df.map { case (t, d) => t -> StrictMath.log(numDocs.toDouble / d.toDouble) }

  /** `($"cnt".cast("double") / $"len") * $"idf"` per in-vocabulary term;
    * OOV terms drop out but stay in the tf denominator. */
  private def weightsOf(toks: Array[String]): Map[String, Double] = {
    val len = toks.length
    toks.groupBy(identity).collect {
      case (t, occ) if idf.contains(t) =>
        t -> (occ.length.toLong.toDouble / len.toDouble) * idf(t)
    }
  }

  /** e9 fixed-point norm: `sqrt(sum((w*w*1e9 + 0.5)::long)::double / 1e9)`. */
  private def normE9(w: Iterable[Double]): Double = {
    var s = 0L
    w.foreach(x => s += halfUpNonNeg(x * x * 1e9))
    math.sqrt(s.toDouble / 1e9)
  }

  private final case class RDoc(rid: Long, w: Map[String, Double], norm: Double)

  private lazy val rDocs: Array[RDoc] = rToks.zipWithIndex.map { case (toks, i) =>
    val w = weightsOf(toks)
    RDoc(i.toLong, w, normE9(w.values))
  }

  private lazy val postings: Map[String, Array[Long]] = {
    val m = mutable.HashMap.empty[String, mutable.ArrayBuffer[Long]]
    rDocs.foreach(d => d.w.keysIterator.foreach(t =>
      m.getOrElseUpdate(t, mutable.ArrayBuffer.empty[Long]) += d.rid))
    m.view.mapValues(_.toArray).toMap
  }

  private lazy val rById: Map[Long, RDoc] = rDocs.map(d => d.rid -> d).toMap

  // ---------------------------------------------------------- q46 mirror

  /** `topKAgainst(k = 1, maxDf = 50)` winner for one title, or None when
    * the query produces no scored row (null/empty/all-OOV/all-capped —
    * the query wrapper then emits the fallback alias 0). */
  def topKAgainstWinner(title: String, maxDf: Double = 50.0): Option[Long] = {
    if (title == null) return None
    val toks = Tokenize.tokenizeAndStem(title)
    if (toks.isEmpty) return None
    val qw = weightsOf(toks)
    if (qw.isEmpty) return None
    val qnorm = normE9(qw.values)
    val dfCap = if (maxDf <= 1.0) math.max(1.0, maxDf * numDocs) else maxDf
    val subCap = qw.keysIterator.filter(t => df(t).toDouble <= dfCap).toArray
    if (subCap.isEmpty) return None
    val cands = subCap.flatMap(t => postings.getOrElse(t, Array.empty[Long])).distinct
    // score = (sum((qw*dw*1e9 + 0.5)::long)::double / 1e9) / (doc_norm * qnorm)
    val best = cands.map { rid =>
      val rd = rById(rid)
      var dotE9 = 0L
      subCap.foreach { t =>
        rd.w.get(t).foreach(dw => dotE9 += halfUpNonNeg(qw(t) * dw * 1e9))
      }
      val s =
        if (rd.norm > 0.0 && qnorm > 0.0) (dotE9.toDouble / 1e9) / (rd.norm * qnorm)
        else 0.0
      (rid, s)
    }.minBy { case (rid, s) => (-s, rid) }
    Some(best._1)
  }

  // ---------------------------------------------------------- q49 mirror

  /** The scoring UDF's contract, replicated exactly: fold the smaller
    * map's terms in sorted (java.lang.String) order against the bigger. */
  private def sparseDot(a: Map[String, Double], b: Map[String, Double]): Double = {
    val (small, big) = if (a.size <= b.size) (a, b) else (b, a)
    small.toArray.sortBy(_._1).foldLeft(0.0) { case (acc, (t, w)) =>
      acc + big.getOrElse(t, 0.0) * w
    }
  }

  /** `thresholdJoin(k = 1, minScore, maxDf)` winner for one title, or
    * None when no candidate reaches the threshold. */
  def thresholdWinner(
      title: String, minScore: Double = 0.3, maxDf: Double = 0.05): Option[Long] = {
    if (title == null) return None
    val toks = Tokenize.tokenizeAndStem(title)
    if (toks.isEmpty) return None
    val qw = weightsOf(toks)
    if (qw.isEmpty) return None
    val qnorm = normE9(qw.values)
    if (!(qnorm > 0.0)) return None

    // prefix filter: (qw_e9 desc, term asc) order, BIGINT running mass,
    // keep while ((total-head)/1e9)/qnorm >= minScore - 1e-6
    val qwE9 = qw.map { case (t, w) => t -> halfUpNonNeg(w * 1e9) }
    val total = qwE9.valuesIterator.sum
    val ordered = qw.keysIterator.toArray
      .sorted(Ordering.by[String, Long](t => -qwE9(t)).orElse(utf8Ord))
    val bound = minScore - 1e-6
    val prefix = mutable.ArrayBuffer.empty[String]
    var head = 0L
    ordered.foreach { t =>
      if ((total - head).toDouble / 1e9 / qnorm >= bound) prefix += t
      head += qwE9(t)
    }

    val dfCap = if (maxDf <= 1.0) math.max(1.0, maxDf * numDocs) else maxDf
    val cands = prefix.iterator
      .filter(t => df(t).toDouble <= dfCap)
      .flatMap(t => postings.getOrElse(t, Array.empty[Long]))
      .toArray.distinct
    if (cands.isEmpty) return None

    val scored = cands.map { rid =>
      val rd = rById(rid)
      val s =
        if (rd.norm > 0.0 && qnorm > 0.0) sparseDot(qw, rd.w) / (rd.norm * qnorm)
        else 0.0
      (rid, s)
    }.filter(_._2 >= minScore)
    if (scored.isEmpty) None
    else Some(scored.minBy { case (rid, s) => (-s, rid) }._1)
  }
}
