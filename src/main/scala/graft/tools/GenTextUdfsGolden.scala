package graft.tools

import java.nio.file.{Files, Paths}

import graft.GoldenCorpus
import graft.functions.TitleStandardizer
import graft.text.Tokenize

/** Dev utility: regenerate the text-UDF-family golden snapshot consumed by
  * [[graft.TextUdfsGolden]] / q121. Pure JVM (the Spark query applies the
  * same per-row pure functions); the w_e9 rounding replicates Spark's
  * `round(double)` (BigDecimal HALF_UP).
  * Usage: runMain graft.tools.GenTextUdfsGolden [out.tsv] */
object GenTextUdfsGolden {
  def main(args: Array[String]): Unit = {
    val out =
      if (args.nonEmpty) args(0)
      else "src/main/resources/text_udfs_golden_snapshot.tsv"
    val idx = TitleStandardizer.index
    val inv = idx.idxToTerm
    val rows = GoldenCorpus.titles.map { title =>
      val stems = Tokenize.tokenizeAndStem(title)
      val firstStem = stems.headOption.getOrElse("")
      val (ti, tv) = idx.queryVector(stems)
      val vec = ti.indices.map(k => inv(ti(k)) -> tv(k)).toMap
      val w = vec.getOrElse(firstStem, 0.0)
      val wE9 = java.math.BigDecimal.valueOf(w * 1e9)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      Seq(title, stems.length, stems.mkString("|"), firstStem, vec.size, wE9)
        .mkString("\t")
    }
    Files.write(Paths.get(out), rows.mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${rows.size} rows to $out")
  }
}
