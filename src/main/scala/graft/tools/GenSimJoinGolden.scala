package graft.tools

import java.nio.file.{Files, Paths}

import graft.SimJoinGolden

/** Dev utility: regenerate the similarity-join golden snapshot consumed by
  * [[graft.SimJoinGolden]] / q127 from the pure-JVM re-derivation.
  * Usage: runMain graft.tools.GenSimJoinGolden [out.tsv] */
object GenSimJoinGolden {
  def main(args: Array[String]): Unit = {
    val out =
      if (args.nonEmpty) args(0)
      else "src/main/resources/simjoin_golden_snapshot.tsv"
    val rows = SimJoinGolden.recompute
    rows.groupBy(_._1).foreach { case (_, rs) =>
      require(rs.map(_._2).sorted == (1 to rs.length), s"rank gap for '${rs.head._1}'")
    }
    Files.write(Paths.get(out),
      rows.map { case (t, r, d, a, c, s) => s"$t\t$r\t$d\t$a\t$c\t$s" }
        .mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${rows.size} rows to $out")
  }
}
