package graft.tools

import java.nio.file.{Files, Paths}

import graft.SimJoinGenericGolden

/** Dev utility: regenerate the generic-similarity-join golden snapshot
  * consumed by [[graft.SimJoinGenericGolden]] / q128. Asserts the corpus
  * exercises its intended edges: the all-OOV query emits nothing, the
  * reordered copy scores exactly 1e6, and the threshold path is a strict
  * subset of per-query candidates.
  * Usage: runMain graft.tools.GenSimJoinGenericGolden [out.tsv] */
object GenSimJoinGenericGolden {
  def main(args: Array[String]): Unit = {
    val out =
      if (args.nonEmpty) args(0)
      else "src/main/resources/simjoin_generic_golden_snapshot.tsv"
    val rows = SimJoinGenericGolden.recompute
    require(!rows.exists(_._2 == 103L), "all-OOV query must emit no rows")
    require(rows.exists { case (m, q, r, d, s) =>
      m == "topk" && q == 100L && r == 1 && d == 0L && s == 1000000L
    }, "reordered copy must be a perfect rank-1 match of right doc 0")
    require(rows.count(_._1 == "thr") > 0 &&
      rows.count(_._1 == "thr") < rows.count(_._1 == "topk") * 3,
      "threshold path should select a nontrivial subset")
    Files.write(Paths.get(out),
      rows.map { case (m, q, r, d, s) => s"$m\t$q\t$r\t$d\t$s" }
        .mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${rows.size} rows to $out")
  }
}
