package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (builder brief):
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything that Spark builtins can express is a pure `Column` (stays
  * inside whole-stage codegen); only language ID and the rolling-hash
  * fingerprint are Scala UDFs (per-row pure functions — embarrassingly
  * parallel, no state beyond small static profile tables).
  */
object TextAnalysis {

  // -------------------------------------------------------- language id

  /** Tiny stopword profiles (top function words) per language. Static and
    * public-knowledge; good enough for a scoring heuristic. */
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "of", "and", "to", "a", "in", "is", "that", "for", "it",
      "on", "with", "as", "was", "at", "by", "an", "be", "this", "are"),
    "de" -> Set("der", "die", "das", "und", "in", "den", "von", "zu", "mit",
      "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine", "als"),
    "es" -> Set("de", "la", "que", "el", "en", "y", "a", "los", "se", "del",
      "las", "un", "por", "con", "no", "una", "su", "para", "es", "al"),
    "fr" -> Set("de", "la", "le", "et", "les", "des", "en", "un", "du", "une",
      "que", "est", "pour", "qui", "dans", "a", "par", "plus", "pas", "au"),
    "it" -> Set("di", "e", "il", "la", "che", "in", "un", "per", "del", "una",
      "con", "non", "sono", "da", "si", "le", "dei", "al", "come", "dello"))

  /** Profile pairs in deterministic order — consumed by the q39 oracle
    * SQL (VALUES table) so the SQL mirror and the UDF share one source. */
  def profileSeq: Seq[(String, String)] =
    profiles.toSeq.sortBy(_._1).flatMap { case (l, ws) => ws.toSeq.sorted.map(l -> _) }

  /** Best-scoring language by stopword hit ratio; "und" (undetermined)
    * when nothing matches. Deterministic tie-break: lexicographic. */
  def detectLang(text: String): String = {
    if (text == null) return "und"
    val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    if (toks.isEmpty) return "und"
    var best = "und"
    var bestScore = 0
    profiles.toSeq.sortBy(_._1).foreach { case (lang, stops) =>
      var s = 0
      toks.foreach(t => if (stops(t)) s += 1)
      if (s > bestScore) { bestScore = s; best = lang }
    }
    best
  }

  val langIdUdf = udf((s: String) => detectLang(s))

  // ------------------------------------------------------ quality score

  /** Quality metrics as a flat struct of codegen-friendly builtins:
    * lengths, token stats, punctuation/digit/space ratios, stopword ratio
    * proxy, type-token ratio. All pure Column expressions. */
  def qualityMetrics(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val nChars = length(text).cast("double")
    val nToks = size(toks).cast("double")
    struct(
      length(text).as("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      (size(array_distinct(toks)).cast("double") / nullif(nToks, lit(0.0))).as("type_token_ratio"),
      (nChars / nullif(nToks, lit(0.0))).as("chars_per_token"),
      (length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
        nullif(nChars, lit(0.0))).as("punct_ratio"),
      (length(regexp_replace(text, "[^0-9]", "")).cast("double") /
        nullif(nChars, lit(0.0))).as("digit_ratio"),
      (length(regexp_replace(text, "[^ ]", "")).cast("double") /
        nullif(nChars, lit(0.0))).as("space_ratio"))
  }

  /** The quality blend WITHOUT the final display rounding: every term is a
    * fixed-shape tree of IEEE double ops, so the value is bit-identical
    * across engines that evaluate the same formula (the DuckDB oracle of
    * `q55_quality_exact` does) — `round(x, 6)` is engine-specific
    * (shortest-repr HALF_UP vs scaled arithmetic) and is applied only in
    * the display variant below. */
  def qualityScoreRaw(m: Column): Column = {
    val lenOk = when(m("n_tokens").between(5, 10000), lit(1.0))
      .otherwise(lit(0.25))
    val punctOk = lit(1.0) - least(m("punct_ratio") * 4.0, lit(1.0))
    val digitOk = lit(1.0) - least(m("digit_ratio") * 4.0, lit(1.0))
    val diversity = least(coalesce(m("type_token_ratio"), lit(0.0)) * 2.0, lit(1.0))
    lenOk * 0.4 + punctOk * 0.2 + digitOk * 0.2 + diversity * 0.2
  }

  /** Scalar quality score in [0,1] from a precomputed [[qualityMetrics]]
    * struct — share one metrics column instead of re-deriving the text
    * expressions (halves the codegen tree). */
  def qualityScoreFromMetrics(m: Column): Column = round(qualityScoreRaw(m), 6)

  /** Scalar quality score in [0,1]: penalize extreme length, high punct /
    * digit density, low lexical diversity. A simple monotone blend —
    * pipelines threshold it. */
  def qualityScore(text: Column): Column = qualityScoreFromMetrics(qualityMetrics(text))

  // ------------------------------------------------------ token counting

  /** Whitespace token count (pure builtin). */
  def tokenCountWs(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, single punctuation —
    * the standard "~chars/4" proxy without a vocab file. */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  // ------------------------------------------------------- fingerprint

  /** Order-sensitive 64-bit rolling polynomial hash over normalized
    * (lowercased, whitespace-collapsed) tokens. Equal normalized content ⇒
    * equal fingerprint; used for shift-tolerant chunk fingerprinting.
    *
    * The per-token hash is the first 8 bytes of MD5(token) (big-endian)
    * and the roll is h*31 + tokenHash in wrapping int64 — both steps an
    * independent engine can replay (the q41 DuckDB oracle mirrors them
    * with hugeint mod-2^64 arithmetic over md5 hex), so the fingerprint
    * is engine-checkable rather than JVM-private. */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    var h = 1125899906842597L // large prime seed
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return h
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes("UTF-8"))
      var th = 0L
      var j = 0
      while (j < 8) { th = (th << 8) | (d(j) & 0xffL); j += 1 }
      h = h * 31L + th
      i += 1
    }
    h
  }

  val fingerprintUdf = udf((s: String) => fingerprint64(s))

  // ------------------------------------------------- text normalization

  /** Canonical text normalization for dedup keys and tokenizer input:
    * Unicode NFKC (folds fullwidth forms, ligatures, compatibility chars),
    * combining-mark stripping after NFD (café→cafe), lowercase,
    * whitespace collapse (incl. NBSP — NFKC already maps U+00A0 to space),
    * trim. Deterministic pure function of the code points — the ICU-free
    * subset every engine agrees on; pinned by a golden-vector oracle
    * (q75) rather than a mirrored SQL dialect. */
  def normalizeText(text: String): String = {
    if (text == null) return null
    val nfkc = java.text.Normalizer.normalize(text, java.text.Normalizer.Form.NFKC)
    val nfd = java.text.Normalizer.normalize(nfkc, java.text.Normalizer.Form.NFD)
    val noMarks = nfd.filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK)
    java.text.Normalizer.normalize(noMarks, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
      .trim
  }

  val normalizeTextUdf = udf((s: String) => normalizeText(s))

  // ------------------------------------------------- keyword extraction

  /** Top-k keywords per document by (term frequency desc, corpus document
    * frequency asc, term asc) — "most frequent, then rarest". The ranking
    * key is ALL-INTEGER by design: a float tf-idf score would rank
    * identically only if both engines' `ln` are bit-equal (libm-specific),
    * whereas this ordering is engine-exact and still monotone in tf·idf
    * for fixed doc length.
    *
    * Plan shape at scale: one shuffle keyed by (doc, term) for the tf agg,
    * one small agg keyed by term for df (map-side combining), an equi-join
    * of per-doc terms against the df table (dimension-sized — Catalyst
    * broadcasts it when small), and a per-doc window limited to k
    * (WindowGroupLimit keeps only k rows per key during the sort). */
  def topKeywords(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val terms = df
      .select(col(idCol).as("doc_id"),
        explode(graft.operators.CorpusFilters.words(col(textCol))).as("term"))
    val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc, $"term".asc)
    tf.join(dfreq, "term")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"doc_id", $"rnk", $"term", $"tf", $"df")
  }
}
