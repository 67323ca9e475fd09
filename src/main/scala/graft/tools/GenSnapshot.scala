package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.functions.TitleStandardizer

/** Dev utility: regenerate the example-corpus snapshot used by
  * Snapshot104Spec. Reads one title per line, writes `title\tstandardized`.
  * Usage: runMain graft.tools.GenSnapshot <titles.txt> <out.tsv> */
object GenSnapshot {
  def main(args: Array[String]): Unit = {
    val Array(in, out) = args
    val lines = Files.readAllLines(Paths.get(in)).asScala
    val mapped = lines.filter(_.nonEmpty).map(t => s"$t\t${TitleStandardizer.standardize(t)}")
    Files.write(Paths.get(out), mapped.mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${mapped.size} rows to $out")
  }
}
