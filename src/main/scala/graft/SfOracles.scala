package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TitleStandardizer
import graft.text.{EnglishStemmer, Tokenize}

/** SF-scale DuckDB oracles for q35 (MinHash+LSH fuzzy dedup), q36
  * (SimHash fingerprints) and q45 (text-UDF battery) — the [[StdOracle]]
  * pattern extended to the remaining rows-only families whose
  * straight-line JVM derivation is cheap and exact at the verification
  * scale factors.
  *
  * Both queries compute UDF values DuckDB cannot reproduce, so through
  * round 8 they were driver-checked rows-only, with function semantics
  * pinned by constructed-corpus golden twins (q125, q121). This closes the
  * remaining composition-at-SF-scale gap the same way StdOracle closed it
  * for the std family: [[prepare]] re-derives the expected values through
  * independent straight-line JVM code (never the Spark query under test)
  * and the oracle SQL replays them as a VALUES table joined to the live
  * `documents` parquet, so the driver's DuckDB compare verifies that the
  * DISTRIBUTED plan (signature UDF → band explode → bucket join → label
  * propagation for q35; the UDF projection battery for q45) reproduces the
  * straight-line contract on the real corpus at every SF.
  *
  * Driver-side cost is bounded: q45's map is keyed by DISTINCT 40-char
  * title prefixes (476 at sf0.01, 4,756 at sf0.1); q35's mirror collects
  * the (doc_id, text) corpus at the verification SF (≤5k docs ⇒ ≤12.5M
  * all-pairs probes with early exit, [[DedupGolden.recomputeFor]]) — an
  * oracle-side derivation, not a cluster-path collect.
  */
object SfOracles {

  /** JVM-computed expected row of q45 for one distinct title. */
  final case class TextRow(title: String, nStems: Int, stemsHash: Long,
                           tfidfCard: Int, weight: Double, firstStem: String)

  @volatile private var prepared:
    Option[(String, IndexedSeq[TextRow], Seq[(Long, Long)], Seq[(Long, Long)])] = None

  /** Spark's `xxhash64(string)` evaluated locally through the same
    * Catalyst expression the distributed plan compiles — a straight-line
    * eval on a literal, not the query under test. */
  private[graft] def xxh64(s: String): Long =
    XxHash64(Seq(Literal(UTF8String.fromString(s), StringType)), 42L)
      .eval(InternalRow.empty).asInstanceOf[Long]

  /** Straight-line derivation of q45's five computed columns for one
    * title, through the SAME published building blocks the q52/q121
    * goldens pin (tokenize, Snowball stem, first-seen-vocab TF-IDF) —
    * shares no code with [[Queries.textUdfs]]'s DataFrame plan. */
  private[graft] def textRowFor(title: String): TextRow = {
    val tokens = Tokenize.tokenize(title)
    val stems = Tokenize.tokenizeAndStem(title)
    val idx = TitleStandardizer.index
    val (ti, tv) = idx.queryVector(stems)
    val inv = idx.idxToTerm
    val firstStem =
      if (tokens.isEmpty) null
      else EnglishStemmer.stem(Tokenize.asciiLower(tokens(0)))
    val raw =
      if (firstStem == null) 0.0
      else {
        var w = 0.0
        var k = 0
        while (k < ti.length) { if (inv(ti(k)) == firstStem) w = tv(k); k += 1 }
        w
      }
    // Spark round(double, 6): BigDecimal HALF_UP, same construction
    val w6 = BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // q45's concat_ws separator is a literal U+0001 (an unambiguous joiner
    // — stems never contain control chars), NOT the empty string it
    // resembles in plan dumps.
    TextRow(title, stems.length, xxh64(stems.mkString("\u0001")), ti.length, w6, firstStem)
  }

  /** Spark `substring(text, 1, 40)` semantics (code-point exact). */
  private[graft] def title40(text: String): String =
    UTF8String.fromString(text).substringSQL(1, 40).toString

  /** Re-derive both oracle maps for `sfDir`. Idempotent per sfDir. */
  def prepare(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (!prepared.exists(_._1 == sfDir)) {
      val docs = Tables(spark, sfDir, "documents")
        .selectExpr("cast(doc_id as long) as doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toIndexedSeq
      val textRows = docs.map(d => title40(d._2)).distinct.sorted
        .map(textRowFor).toIndexedSeq
      val clusters = DedupGolden.recomputeFor(docs)
      val sims = docs.map { case (id, t) =>
        (id, if (t == null) 0L else SimhashGolden.simhashOf(t)) }
      prepared = Some((sfDir, textRows, clusters, sims))
    }
  }

  private def lit(s: String): String =
    if (s == null) "CAST(NULL AS VARCHAR)"
    else "'" + s.replace("'", "''") + "'"

  /** Double as a DuckDB literal that parses back to the identical IEEE
    * value (shortest round-trip repr through strtod). */
  private def dlit(d: Double): String = s"CAST('${d.toString}' AS DOUBLE)"

  private def failCte(cols: String): String =
    // Loud DuckDB-side failure: a dump that skipped prepare() must never
    // hash-match by accident.
    s"$cols AS (SELECT error('graft SfOracles.prepare was not called'), 0, 0, 0, 0.0, '')"

  private def textCte: String = prepared match {
    case Some((_, rows, _, _)) =>
      rows.map { r =>
        s"(${lit(r.title)}, ${r.nStems}, CAST(${r.stemsHash} AS BIGINT), " +
          s"${r.tfidfCard}, ${dlit(r.weight)}, ${lit(r.firstStem)})"
      }.mkString(
        "tm(title, n_stems, stems_hash, tfidf_card, first_stem_weight, first_stem) AS (VALUES ",
        ", ", ")")
    case None =>
      failCte("tm(title, n_stems, stems_hash, tfidf_card, first_stem_weight, first_stem)")
  }

  private def fuzzyCte: String = prepared match {
    case Some((_, _, clusters, _)) =>
      clusters.map { case (d, c) => s"($d, $c)" }
        .mkString("fz(doc_id, cluster_id) AS (VALUES ", ", ", ")")
    case None =>
      "fz(doc_id, cluster_id) AS (SELECT error('graft SfOracles.prepare was not called'), 0)"
  }

  private def simhashCte: String = prepared match {
    case Some((_, _, _, sims)) =>
      sims.map { case (d, h) => s"($d, CAST($h AS BIGINT))" }
        .mkString("sh(doc_id, simhash) AS (VALUES ", ", ", ")")
    case None =>
      "sh(doc_id, simhash) AS (SELECT error('graft SfOracles.prepare was not called'), 0)"
  }

  /** Oracle SQL, same column names/ordering as the Spark side. */
  def oracles: Map[String, String] = Map(
    "q36_dedup_simhash" ->
      s"""WITH $simhashCte
         |SELECT d.doc_id, s.simhash
         |FROM documents d JOIN sh s ON s.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q35_dedup_fuzzy" ->
      s"""WITH $fuzzyCte
         |SELECT d.doc_id, CAST(f.cluster_id AS BIGINT) AS cluster_id
         |FROM documents d JOIN fz f ON f.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q45_text_udfs" ->
      s"""WITH $textCte
         |SELECT d.doc_id, m.n_stems, m.stems_hash, m.tfidf_card,
         |       m.first_stem_weight, m.first_stem
         |FROM documents d JOIN tm m ON m.title = substr(d.text, 1, 40)
         |ORDER BY d.doc_id""".stripMargin)
}
