package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{EnglishStemmer, Tokenize}

/** Vectors from the published Snowball English (Porter2) demonstration
  * vocabulary (snowballstem.org) + algorithm-description edge cases.
  * Parity target: rust-stemmers `Algorithm::English` 1.2.0
  * (`/root/reference/Cargo.toml`, used at `/root/reference/src/utils.rs:47`).
  */
class StemmerSpec extends AnyFunSuite {

  private val vectors = Seq(
    // consign/consist block of the official demo vocabulary
    "consign" -> "consign", "consigned" -> "consign", "consigning" -> "consign",
    "consignment" -> "consign",
    "consist" -> "consist", "consisted" -> "consist", "consistency" -> "consist",
    "consistent" -> "consist", "consistently" -> "consist", "consisting" -> "consist",
    "consists" -> "consist",
    "consolation" -> "consol", "consolations" -> "consol",
    "consolatory" -> "consolatori",
    "console" -> "consol", "consoled" -> "consol", "consoles" -> "consol",
    "consolidate" -> "consolid", "consolidated" -> "consolid",
    "consolidating" -> "consolid",
    "consonant" -> "conson",
    "conspiracy" -> "conspiraci",
    "conspirator" -> "conspir", "conspirators" -> "conspir",
    "conspire" -> "conspir", "conspired" -> "conspir", "conspiring" -> "conspir",
    "constable" -> "constabl", "constables" -> "constabl",
    "constance" -> "constanc", "constancy" -> "constanc",
    // knack/knock block
    "knack" -> "knack", "knacks" -> "knack", "knackeries" -> "knackeri",
    "knave" -> "knave", "knaves" -> "knave", "knavish" -> "knavish",
    "kneaded" -> "knead", "kneading" -> "knead",
    "knee" -> "knee", "knees" -> "knee",
    "kneel" -> "kneel", "kneeled" -> "kneel", "kneeling" -> "kneel",
    "knelt" -> "knelt", "knew" -> "knew",
    "knife" -> "knife", "knight" -> "knight", "knightly" -> "knight",
    "knights" -> "knight",
    "knit" -> "knit", "knits" -> "knit", "knitted" -> "knit",
    "knitting" -> "knit", "knives" -> "knive",
    "knob" -> "knob", "knobs" -> "knob",
    "knock" -> "knock", "knocked" -> "knock", "knocker" -> "knocker",
    "knockers" -> "knocker", "knocking" -> "knock", "knocks" -> "knock",
    "knot" -> "knot", "knots" -> "knot",
    // exception list 1
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "atlas" -> "atlas", "cosmos" -> "cosmos",
    "bias" -> "bias", "andes" -> "andes",
    // exception list 2 (post step-1a invariants)
    "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
    "herring" -> "herring", "earring" -> "earring",
    "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed",
    // step-1b adjustments from the algorithm description
    "hoping" -> "hope", "hopping" -> "hop", "hop" -> "hop",
    "agreed" -> "agre", "feed" -> "feed",
    // step-1a subtleties
    "ties" -> "tie", "cries" -> "cri", "gas" -> "gas", "gaps" -> "gap",
    "kiwis" -> "kiwi", "stress" -> "stress", "caresses" -> "caress",
    // step-1c
    "cry" -> "cri", "by" -> "by", "say" -> "say", "enjoy" -> "enjoy",
    // short words untouched
    "a" -> "a", "is" -> "is",
    // R1 special prefixes
    "generously" -> "generous", "generical" -> "generic",
    // engineering-domain words that drive the golden tests
    "engineer" -> "engin", "engineers" -> "engin", "engineering" -> "engin",
    "digital" -> "digit", "data" -> "data",
    "robotics" -> "robot", "biologist" -> "biologist",
    "scientist" -> "scientist", "scientists" -> "scientist",
    "writer" -> "writer", "writers" -> "writer",
    "author" -> "author", "authors" -> "author", "poet" -> "poet"
  )

  test("snowball english vectors") {
    val bad = vectors.collect {
      case (in, want) if EnglishStemmer.stem(in) != want =>
        s"$in -> ${EnglishStemmer.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  test("stemming is idempotent over the dictionary-ish vocabulary") {
    // Porter2 is not idempotent in general — these four re-stem under the
    // official Snowball algorithm (ugli->ug, earli->ear, onli->on,
    // agre->agr), so they are excluded; the rest must be stable.
    val knownNonIdempotent = Set("ugly", "early", "only", "agreed")
    val bad = vectors.iterator.map(_._1).filterNot(knownNonIdempotent).map { in =>
      val once = EnglishStemmer.stem(in)
      (in, once, EnglishStemmer.stem(once))
    }.collect { case (in, once, twice) if once != twice =>
      s"$in: $once -> $twice"
    }.toSeq
    assert(bad.isEmpty, s"\nnon-idempotent stems:\n${bad.mkString("\n")}")
  }

  test("tokenizer: \\w+ with ascii lowercase") {
    assert(Tokenize.tokenize("Sr. Software Engineer - Backend").toSeq ==
      Seq("sr", "software", "engineer", "backend"))
    assert(Tokenize.tokenize("  ").isEmpty)
    assert(Tokenize.tokenize("C++ & .NET dev_ops 2024").toSeq ==
      Seq("c", "net", "dev_ops", "2024"))
    // unicode word chars are kept (Rust \w is unicode), non-ASCII case kept
    assert(Tokenize.tokenize("Ingeniería Química").toSeq ==
      Seq("ingeniería", "química"))
  }
}
