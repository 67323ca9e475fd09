package graft

import scala.io.Source

/** Pinned outputs of the text-UDF family (tokenize+stem, sparse TF-IDF
  * vector cardinality and first-stem weight) over the 104-title example
  * corpus — the q52 pattern applied to the UDFs DuckDB cannot evaluate.
  * Fixture `text_udfs_golden_snapshot.tsv` is regenerated with
  * `runMain graft.tools.GenTextUdfsGolden` and drift-guarded by
  * `TextUdfsGoldenSpec`; [[oracleValuesSql]] replays it as an
  * engine-independent VALUES oracle for q121.
  */
object TextUdfsGolden {

  /** (title, n_stems, stems_str, first_stem, tfidf_card, w_e9) */
  lazy val rows: Seq[(String, Int, String, String, Int, Long)] = {
    val src = Source.fromResource("text_udfs_golden_snapshot.tsv")(scala.io.Codec.UTF8)
    try src.getLines().filter(_.nonEmpty).map { line =>
      val a = line.split("\t", -1)
      require(a.length == 6, s"bad golden row: $line")
      (a(0), a(1).toInt, a(2), a(3), a(4).toInt, a(5).toLong)
    }.toVector
    finally src.close()
  }

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB-runnable oracle: pinned rows as a VALUES table with the same
    * column names/types/order as [[Queries.textUdfsGolden]]. */
  lazy val oracleValuesSql: String =
    rows.map { case (t, n, ss, fs, c, w) =>
      s"(${lit(t)}, $n, ${lit(ss)}, ${lit(fs)}, $c, $w)"
    }.mkString(
      "SELECT title, CAST(n_stems AS INTEGER) AS n_stems, stems_str, " +
        "first_stem, CAST(tfidf_card AS INTEGER) AS tfidf_card, " +
        "CAST(w_e9 AS BIGINT) AS w_e9 FROM (VALUES ",
      ", ",
      ") AS g(title, n_stems, stems_str, first_stem, tfidf_card, w_e9) " +
        "ORDER BY title")
}
