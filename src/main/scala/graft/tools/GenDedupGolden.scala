package graft.tools

import java.nio.file.{Files, Paths}

import graft.DedupGolden

/** Dev utility: regenerate the fuzzy-dedup golden snapshot consumed by
  * [[graft.DedupGolden]] / q125 from the pure-JVM re-derivation, and print
  * the cluster structure for eyeballing. Asserts the construction intent:
  * the identical pair and both fuzzy groups merge, the 8-substitution pair
  * stays split, singletons stay alone.
  * Usage: runMain graft.tools.GenDedupGolden [out.tsv] */
object GenDedupGolden {
  def main(args: Array[String]): Unit = {
    val out =
      if (args.nonEmpty) args(0)
      else "src/main/resources/dedup_golden_snapshot.tsv"
    val rows = DedupGolden.recompute
    val byCluster = rows.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    byCluster.toSeq.sortBy(_._1).foreach { case (c, ms) =>
      println(s"cluster $c: ${ms.mkString(", ")}")
    }
    val cl = rows.toMap
    require(cl(1L) == 0L, "identical pair 0/1 must merge")
    require(cl(3L) == 2L && cl(4L) == 2L, "fuzzy group 2/3/4 must merge")
    require(cl(6L) == 5L, "fuzzy pair 5/6 must merge")
    require(cl(7L) == 7L && cl(8L) == 8L, "8-substitution pair must SPLIT")
    (9L to 14L).foreach(i => require(cl(i) == i, s"singleton $i must stay alone"))
    Files.write(Paths.get(out),
      rows.map { case (d, c) => s"$d\t$c" }.mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${rows.size} rows to $out")
  }
}
