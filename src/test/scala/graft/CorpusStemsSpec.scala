package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

import graft.text.EnglishStemmer

/** Stemmer drift guard over the COMPLETE input domain that determines
  * matching: every distinct token of the 17,772-alias dictionary corpus
  * (4,532 tokens). Any Snowball-rule regression that could move a
  * TF-IDF vocabulary entry shows up here, not just on the 5 goldens.
  * Regenerate after an intentional change: `runMain
  * graft.tools.GenStemSnapshot src/test/resources/corpus_stems_snapshot.tsv`. */
class CorpusStemsSpec extends AnyFunSuite {

  test("all 4,532 dictionary-corpus token stems are unchanged") {
    val src = Source.fromResource("corpus_stems_snapshot.tsv")(scala.io.Codec.UTF8)
    val expected =
      try src.getLines().filter(_.nonEmpty).map { line =>
        val Array(tok, stem) = line.split("\t", 2)
        tok -> stem
      }.toVector
      finally src.close()
    assert(expected.size == 4532)
    val bad = expected.collect {
      case (tok, want) if EnglishStemmer.stem(tok) != want =>
        s"$tok: got ${EnglishStemmer.stem(tok)}, want $want"
    }
    assert(bad.isEmpty, s"\n${bad.take(20).mkString("\n")}")
  }
}
