package graft.tools

import java.nio.file.{Files, Paths}

import graft.SimhashGolden

/** Dev utility: regenerate the simhash golden snapshot consumed by
  * [[graft.SimhashGolden]] / q129. Asserts the construction intent: the
  * identical, reordered and case-folded twins of doc 0 sit at distance 0
  * of each other.
  * Usage: runMain graft.tools.GenSimhashGolden [out.tsv] */
object GenSimhashGolden {
  def main(args: Array[String]): Unit = {
    val out =
      if (args.nonEmpty) args(0)
      else "src/main/resources/simhash_golden_snapshot.tsv"
    val rows = SimhashGolden.recompute
    rows.foreach { case (a, b, d) => println(s"pair $a-$b hamming $d") }
    val zeroSet = rows.filter(_._3 == 0).map { case (a, b, _) => (a, b) }.toSet
    Seq((0L, 1L), (0L, 2L), (0L, 7L), (1L, 2L), (1L, 7L), (2L, 7L)).foreach { p =>
      require(zeroSet.contains(p), s"twin pair $p must be at distance 0")
    }
    Files.write(Paths.get(out),
      rows.map { case (a, b, d) => s"$a\t$b\t$d" }.mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${rows.size} rows to $out")
  }
}
