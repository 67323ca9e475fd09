package graft

/** The DuckDB CTE chain replaying BM25 scoring end-to-end (tokenize →
  * postings → df → e4-rounded contributions → BIGINT score sums →
  * ranked), shared by the q152/q155/q159/q161/q166/q167 oracle (rank ≤ 5
  * tail in [[SparkEntry.oracleSql]]) and the q169 hybrid-RRF oracle
  * (rank ≤ 10 leg fused with the IVF mirror in [[SfOracles]]). Identical
  * double expression tree from exact integer inputs (tf, df, dl, N,
  * Σdl), each contribution e4-rounded so the per-(query, doc) sum is
  * BIGINT; the k1+1 factor is written (1.2 + 1.0) so both engines
  * constant-fold the same IEEE add rather than parsing a different
  * literal. */
object Bm25OracleSql {

  /** CTEs `toks … ranked`; compose as `s"WITH $rankedCtes SELECT …"`.
    * (A def, not a val: it reads `template`, declared below.) */
  def rankedCtes: String = rankedCtesExcluding("")

  /** [[rankedCtes]] with deleted documents excluded from the ranking —
    * the q170 tombstone-delete oracle. `excludeDocs` is a DuckDB
    * predicate over `p.doc_id` (e.g. `p.doc_id % 7 = 3`) naming the
    * DELETED docs. Placement encodes `Bm25.deleteFromIndex`'s published
    * semantics exactly: the filter sits in the contribution join —
    * AFTER `posting`/`dfs`/`tot`, so df, N and Σdl keep describing the
    * historical corpus (the Lucene trade: surviving docs' SCORES are
    * unchanged by a delete) — and BEFORE `ranked`, so ranks are
    * recomputed over survivors only. */
  def rankedCtesExcluding(excludeDocs: String): String =
    template.replace("__EXCLUDE__",
      if (excludeDocs.isEmpty) "" else s"\n  WHERE NOT ($excludeDocs)")

  /** [[rankedCtes]] over a RESTRICTED corpus — the q179 time-travel
    * oracle: a probe that crossed an append commit serves the index as
    * built, so N, Σdl, df AND the candidate postings all describe only
    * the build-time documents (`corpusPred` over `doc_id`). Statistics
    * shrink WITH the corpus here — unlike [[rankedCtesExcluding]],
    * whose excluded docs leave candidates but keep their statistics
    * (the delete semantics). The query batch is unaffected: qt's
    * every-50th qids are all even, so restricting toks to the even
    * build half reproduces the live batch exactly. */
  def rankedCtesCorpus(corpusPred: String): String =
    rankedCtes.replace("FROM documents)",
      s"FROM documents WHERE $corpusPred)")

  /** The q174 DOCUMENT-UPDATE oracle: the recipe `delete(U) →
    * compactIndex (fold) → appendToIndex(U with new text)` leaves an
    * index whose published semantics are exactly replayable:
    *
    *  - scoring postings = (v1 minus U) ∪ U_v2 — the fold physically
    *    dropped U's old rows, the append added the new versions;
    *  - df per term = df over the FULL v1 corpus (U's old versions
    *    included — delete froze statistics, compaction didn't touch
    *    them) PLUS df over the U_v2 batch (the append's additive merge);
    *  - N = N_v1 + |U|, Σdl = Σdl_v1 + Σdl(U_v2) — additive counters.
    *
    * `updPred` names the updated docs (a predicate over `doc_id`);
    * `suffix` is the text appended to each updated document's v2 body
    * (lowercase tokens). */
  def updateCtes(updPred: String, suffix: String): String =
    s"""toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ts
      |  FROM documents),
      |toks2 AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text || '$suffix'), '\\s+'), t -> t <> '') AS ts
      |  FROM documents WHERE $updPred),
      |tot AS (
      |  SELECT CAST((SELECT count(*) FROM toks) + (SELECT count(*) FROM toks2) AS BIGINT) AS n,
      |         CAST((SELECT coalesce(sum(len(ts)), 0) FROM toks)
      |            + (SELECT coalesce(sum(len(ts)), 0) FROM toks2) AS BIGINT) AS sumdl),
      |qt AS (
      |  SELECT DISTINCT qid, term FROM (
      |    SELECT doc_id AS qid, unnest(ts[1:6]) AS term
      |    FROM toks WHERE doc_id % 50 = 0)),
      |post1 AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
      |         CAST(max(dl) AS BIGINT) AS dl
      |  FROM (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks)
      |  WHERE term IN (SELECT term FROM qt)
      |  GROUP BY doc_id, term),
      |post2 AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
      |         CAST(max(dl) AS BIGINT) AS dl
      |  FROM (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks2)
      |  WHERE term IN (SELECT term FROM qt)
      |  GROUP BY doc_id, term),
      |dfs AS (
      |  SELECT term, CAST(sum(df) AS BIGINT) AS df FROM (
      |    SELECT term, count(*) AS df FROM post1 GROUP BY term
      |    UNION ALL
      |    SELECT term, count(*) AS df FROM post2 GROUP BY term)
      |  GROUP BY term),
      |posting AS (
      |  SELECT * FROM post1 WHERE NOT ($updPred)
      |  UNION ALL SELECT * FROM post2),
      |contrib AS (
      |  SELECT q.qid, p.doc_id,
      |    CAST(round(
      |      ln(1.0 + (t.n - d.df + 0.5) / (d.df + 0.5)) *
      |      ((p.tf * (1.2 + 1.0)) /
      |       (p.tf + 1.2 * (1.0 - 0.75 + 0.75 *
      |         (p.dl / (CAST(t.sumdl AS DOUBLE) / t.n)))))
      |      * 1e4) AS BIGINT) AS c_e4
      |  FROM qt q
      |  JOIN posting p ON q.term = p.term
      |  JOIN dfs d ON q.term = d.term
      |  CROSS JOIN tot t),
      |scores AS (
      |  SELECT qid, doc_id, CAST(sum(c_e4) AS BIGINT) AS score_e4
      |  FROM contrib GROUP BY qid, doc_id),
      |ranked AS (
      |  SELECT qid, doc_id, score_e4,
      |    ROW_NUMBER() OVER (PARTITION BY qid
      |      ORDER BY score_e4 DESC, doc_id) AS rank
      |  FROM scores)""".stripMargin

  private val template: String =
    """toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
      |  FROM documents),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(coalesce(sum(len(ts)), 0) AS BIGINT) AS sumdl
      |  FROM toks),
      |qt AS (
      |  SELECT DISTINCT qid, term FROM (
      |    SELECT doc_id AS qid, unnest(ts[1:6]) AS term
      |    FROM toks WHERE doc_id % 50 = 0)),
      |posting AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
      |         CAST(max(dl) AS BIGINT) AS dl
      |  FROM (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks)
      |  WHERE term IN (SELECT term FROM qt)
      |  GROUP BY doc_id, term),
      |dfs AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM posting GROUP BY term),
      |contrib AS (
      |  SELECT q.qid, p.doc_id,
      |    CAST(round(
      |      ln(1.0 + (t.n - d.df + 0.5) / (d.df + 0.5)) *
      |      ((p.tf * (1.2 + 1.0)) /
      |       (p.tf + 1.2 * (1.0 - 0.75 + 0.75 *
      |         (p.dl / (CAST(t.sumdl AS DOUBLE) / t.n)))))
      |      * 1e4) AS BIGINT) AS c_e4
      |  FROM qt q
      |  JOIN posting p ON q.term = p.term
      |  JOIN dfs d ON q.term = d.term
      |  CROSS JOIN tot t__EXCLUDE__),
      |scores AS (
      |  SELECT qid, doc_id, CAST(sum(c_e4) AS BIGINT) AS score_e4
      |  FROM contrib GROUP BY qid, doc_id),
      |ranked AS (
      |  SELECT qid, doc_id, score_e4,
      |    ROW_NUMBER() OVER (PARTITION BY qid
      |      ORDER BY score_e4 DESC, doc_id) AS rank
      |  FROM scores)""".stripMargin
}
