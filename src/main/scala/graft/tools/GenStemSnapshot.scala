package graft.tools

import java.nio.file.{Files, Paths}

import graft.dict.TitleDictionary
import graft.text.{EnglishStemmer, Tokenize}

/** Dev utility: snapshot the stem of every distinct token in the bundled
  * dictionary corpus (`token\tstem`) — the complete input domain that
  * determines matching behavior.
  * Usage: runMain graft.tools.GenStemSnapshot <out.tsv> */
object GenStemSnapshot {
  def main(args: Array[String]): Unit = {
    val tokens = TitleDictionary.corpus.iterator
      .flatMap(Tokenize.tokenize)
      .toVector.distinct.sorted
    val lines = tokens.map(t => s"$t\t${EnglishStemmer.stem(t)}")
    Files.write(Paths.get(args(0)), lines.mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${lines.size} token stems to ${args(0)}")
  }
}
