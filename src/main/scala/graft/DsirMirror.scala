package graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Straight-line JVM mirror of q139 (DSIR Gumbel-top-k importance
  * resampling) for the SF-scale DuckDB oracle: re-derives every selected
  * row from the published contract of [[operators.Dsir]] through
  * independent imperative code. Exact because the operator's only float
  * steps (the per-bucket λ and the per-doc Gumbel) are computed once per
  * bucket/doc from exact integers and rounded to e4 BIGINT before any
  * distributed aggregation — per-doc weights are pure BIGINT sums.
  *
  * Tokenization and hashing replay the very same Catalyst expressions the
  * plan compiles (`WordTokens` / `xxhash64`) as local straight-line evals
  * on literals — the [[SfOracles.xxh64]] precedent — never the DataFrame
  * query under test.
  */
object DsirMirror {

  /** `graft_tokens` (lower-cased whitespace tokens) evaluated locally. */
  private[graft] def tokensOf(text: String): Array[String] = {
    if (text == null) return Array.empty[String]
    val r = graft.expressions.WordTokens(
        Literal(UTF8String.fromString(text), StringType))
      .eval(InternalRow.empty)
    if (r == null) Array.empty[String]
    else r.asInstanceOf[ArrayData].toObjectArray(StringType)
      .map(_.asInstanceOf[UTF8String].toString)
  }

  /** Unigram + bigram feature stream (bigrams joined by single spaces,
    * the `graft_ngrams(ts, 2)` contract). Shared with the q144 hashed
    * quality-classifier mirror (same feature space by design). */
  private[graft] def gramsOf(text: String): Array[String] = {
    val ts = tokensOf(text)
    if (ts.length < 2) ts
    else ts ++ (0 until ts.length - 1).map(i => ts(i) + " " + ts(i + 1))
  }

  /** `pmod(xxhash64(gram), buckets)`. */
  private[graft] def bucketOf(gram: String, buckets: Long): Long = {
    val h = SfOracles.xxh64(gram)
    ((h % buckets) + buckets) % buckets
  }

  private def sparkRoundE4(x: Double): Long =
    SimJoinSfMirror.sparkRoundToLong(x * 1e4)

  /** Recompute q139's full output: (rnk, doc_id, n_feats, logw_e4,
    * key_e4) for the top `k` docs, target = docs with lang == "en". */
  def recompute(docs: Seq[(Long, String, String)], k: Int = 100,
      buckets: Int = 8192): Seq[(Int, Long, Long, Long, Long)] = {
    val b = buckets.toLong

    // per-doc bucket counts over the raw corpus
    val perDoc = docs.map { case (id, text, _) =>
      val m = mutable.HashMap.empty[Long, Long]
      gramsOf(text).foreach { g =>
        val bk = bucketOf(g, b); m.update(bk, m.getOrElse(bk, 0L) + 1L)
      }
      id -> m
    }
    val rCounts = mutable.HashMap.empty[Long, Long]
    perDoc.foreach(_._2.foreach { case (bk, c) =>
      rCounts.update(bk, rCounts.getOrElse(bk, 0L) + c) })
    val tCounts = mutable.HashMap.empty[Long, Long]
    docs.foreach { case (_, text, lang) =>
      if (lang == "en") gramsOf(text).foreach { g =>
        val bk = bucketOf(g, b); tCounts.update(bk, tCounts.getOrElse(bk, 0L) + 1L)
      }
    }
    val tTot = tCounts.valuesIterator.sum
    val rTot = rCounts.valuesIterator.sum

    // λ_e4 per raw bucket:
    // round((ln((c_t+1)/(t_tot+B)) - ln((c_r+1)/(r_tot+B))) * 1e4)::long
    val lamE4 = rCounts.map { case (bk, cr) =>
      val ct = tCounts.getOrElse(bk, 0L)
      bk -> sparkRoundE4(
        StrictMath.log((ct + 1L).toDouble / (tTot + b).toDouble) -
          StrictMath.log((cr + 1L).toDouble / (rTot + b).toDouble))
    }

    val perDocById = perDoc.toMap
    val rows = docs.map { case (id, _, _) =>
      val m = perDocById(id)
      val nFeats = m.valuesIterator.sum
      var logw = 0L
      m.foreach { case (bk, c) => logw += c * lamE4(bk) }
      // deterministic Gumbel: u = ((xxhash64("dsir-gumbel-"+id) &
      // Long.MaxValue) + 0.5) / 2^63; g_e4 = round(-ln(-ln(u))*1e4)
      val h = SfOracles.xxh64("dsir-gumbel-" + id.toString)
      // clamped one ulp below 1.0 like the operator (the long→double
      // cast rounds, so near-2^63 hashes would otherwise hit u = 1.0)
      val u = math.min(
        ((h & Long.MaxValue).toDouble + 0.5) / 9.223372036854775808e18,
        0.9999999999999999)
      val gE4 = sparkRoundE4(-StrictMath.log(-StrictMath.log(u)))
      (id, nFeats, logw, logw + gE4)
    }
    rows.sortBy { case (id, _, _, key) => (-key, id) }
      .take(k).zipWithIndex
      .map { case ((id, nFeats, logw, key), i) => (i + 1, id, nFeats, logw, key) }
  }
}
