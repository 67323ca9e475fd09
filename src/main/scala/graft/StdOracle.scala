package graft

import org.apache.spark.sql.SparkSession
import graft.functions.TitleStandardizer

/** SF-scale DuckDB oracles for the std query family (q30–q34).
  *
  * The flagship `standardize_title` UDF is not SQL-expressible, so those
  * queries were driver-checked rows-only through round 7 (function
  * semantics pinned separately by the q52 VALUES golden + the 104-title
  * snapshot). This closes the composition gap: [[prepare]] collects the
  * DISTINCT title prefixes actually present in `documents` at the scale
  * factor under verification (476 at sf0.01, 4,756 at sf0.1 — driver-side
  * collect is bounded by corpus vocabulary, not corpus size) and computes
  * each expected output through the straight-line JVM [[TitleStandardizer]]
  * — the same independent derivation path the q52 golden pins, NOT the
  * Spark query under test. The oracle SQL then re-expresses each query as
  * plain relational algebra over `documents` joined to that VALUES map, so
  * the driver's DuckDB compare verifies the *composition* (group-by,
  * filter, rollup, distributed similarity join) at SF scale.
  *
  * For q34 the check is strictly stronger than a value table: the Spark
  * side is the fully distributed [[graft.operators.SimilarityJoin]] path
  * (explode → broadcast postings join → windowed argmax), so a green hash
  * proves the distributed plan reproduces the reference's single-node
  * argmax semantics (`/root/reference/src/lib.rs:62-67`) on the live
  * corpus, tie-breaks included.
  *
  * [[Verify]] / [[tools.VerifyOne]] call [[prepare]] before dumping
  * `oracle_sql.json`; if anything dumps unprepared, the placeholder SQL
  * fails loudly in DuckDB (never a silent green).
  */
object StdOracle {
  @volatile private var prepared: Option[(String, IndexedSeq[(String, String)])] = None

  /** Compute (title → JVM-standardized output) for every distinct title
    * prefix in `documents` at `sfDir`. Idempotent per sfDir. */
  def prepare(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (!prepared.exists(_._1 == sfDir)) {
      import org.apache.spark.sql.functions.{substring, col}
      val titles = Tables(spark, sfDir, "documents")
        .select(substring(col("text"), 1, 40).as("title"))
        .distinct()
        .collect()
        .map(_.getString(0))
        .sorted
        .toIndexedSeq
      val pairs = titles.map(t => (t, TitleStandardizer.standardize(t)))
      prepared = Some((sfDir, pairs))
    }
  }

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The `std_map(title, std)` CTE body for the prepared scale factor. */
  private def valuesCte: String = prepared match {
    case Some((_, pairs)) =>
      pairs.map { case (t, s) => s"(${lit(t)}, ${lit(s)})" }
        .mkString("std_map(title, std) AS (VALUES ", ", ", ")")
    case None =>
      // Loud DuckDB-side failure: a dump that skipped prepare() must never
      // hash-match by accident.
      "std_map(title, std) AS (SELECT error('graft StdOracle.prepare was not called'), '')"
  }

  /** `documents` rows joined to the JVM-computed std map. */
  private def docsCte: String =
    """docs AS (
      |  SELECT d.doc_id, m.title, m.std, d.lang
      |  FROM documents d JOIN std_map m ON m.title = substr(d.text, 1, 40))""".stripMargin

  /** Oracle SQL for the five std-family queries, same column names and
    * ordering as the Spark side ([[Queries.stdScan]] etc.). */
  def oracles: Map[String, String] = Map(
    "q30_std_scan" ->
      s"""WITH $valuesCte, $docsCte
         |SELECT doc_id, title, std FROM docs ORDER BY doc_id""".stripMargin,
    "q31_std_group_count" ->
      s"""WITH $valuesCte, $docsCte
         |SELECT std, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs
         |FROM docs GROUP BY std ORDER BY n_docs DESC, std ASC""".stripMargin,
    "q32_std_filter" ->
      s"""WITH $valuesCte, $docsCte
         |SELECT doc_id, std FROM docs
         |WHERE std LIKE '%Worker%'
         |   OR std IN ('Data Strategist - Data Scientists', 'Poet - Writers and Authors')
         |ORDER BY doc_id""".stripMargin,
    "q33_std_category_rollup" ->
      s"""WITH $valuesCte, $docsCte
         |SELECT split_part(std, ' - ', 2) AS category, COUNT(*) AS n
         |FROM docs GROUP BY 1 ORDER BY n DESC, category ASC""".stripMargin,
    "q34_similarity_join" ->
      s"""WITH $valuesCte, $docsCte
         |SELECT doc_id, std FROM docs ORDER BY doc_id""".stripMargin)
}
