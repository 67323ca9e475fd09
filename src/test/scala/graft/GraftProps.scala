package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.dict.TitleDictionary
import graft.functions.{TextAnalysis, TitleStandardizer}
import graft.operators.Dedup
import graft.text.{EnglishStemmer, Tokenize}

/** Property-based invariants (SURVEY §5 test plan item c). Pure-JVM
  * properties only — Spark-plan behavior is covered by the suite specs. */
object GraftProps extends Properties("graft") {

  private val corpusSet = TitleDictionary.corpus.toSet

  property("tokenize emits only lowercase-ASCII-folded word tokens") =
    forAll(Gen.asciiPrintableStr) { s =>
      Tokenize.tokenize(s).forall(t => t.nonEmpty && !t.exists(c => c >= 'A' && c <= 'Z'))
    }

  property("standardize output is '<dictionary alias> - <category>'") =
    forAll(Gen.asciiPrintableStr) { s =>
      val out = TitleStandardizer.standardize(s)
      val alias = TitleStandardizer.matchAlias(s)
      out == s"$alias - ${TitleDictionary.categoryOf(alias)}" && corpusSet(alias)
    }

  property("strings with no word chars fall back to corpus[0]") = {
    val junk = Gen.nonEmptyListOf(Gen.oneOf(" .,;:!?#$%^&*()-+/\\'\"".toSeq)).map(_.mkString)
    forAll(junk) { s =>
      TitleStandardizer.standardize(s) == "General Worker - All Occupations"
    }
  }

  property("stemmer output is stable ASCII and never longer than input") =
    forAll(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)) { w =>
      EnglishStemmer.stem(w).length <= w.length
    }

  property("query vectors have ascending term ids and non-negative weights") =
    forAll(Gen.asciiPrintableStr) { s =>
      val (idx, vals) = TitleStandardizer.index.queryVector(Tokenize.tokenizeAndStem(s))
      idx.sliding(2).forall(p => p.length < 2 || p(0) < p(1)) && vals.forall(_ >= 0.0)
    }

  property("bestMatch index always within corpus bounds") =
    forAll(Gen.asciiPrintableStr) { s =>
      val i = TitleStandardizer.index.bestMatch(Tokenize.tokenizeAndStem(s))
      i >= 0 && i < TitleDictionary.corpus.length
    }

  property("fingerprint is whitespace/case-normalization invariant") =
    forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { words =>
      val a = TextAnalysis.fingerprint64(words.mkString(" "))
      val b = TextAnalysis.fingerprint64(words.map(_.toUpperCase).mkString("   "))
      a == b
    }

  property("detectLang returns a known code") = {
    val known = Set("en", "de", "es", "fr", "it", "und")
    forAll(Gen.asciiPrintableStr)(s => known(TextAnalysis.detectLang(s)))
  }
}
