package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusFilters

class CorpusFiltersSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  // ------------------------------------------------------- gopher rules

  test("gopher rules: each rule trips on its planted violation") {
    import spark.implicits._
    // ≥50 words, all bigrams distinct, mean word length in [3,10],
    // alphabetic, contains stopwords.
    val good = "the and that with " + (1 to 56).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short with the and"),              // < 50 words
      (3L, ("a b c d e f g h i j " * 6).trim + " the and of"), // mean word len < 3
      (4L, (("the supercalifragilistic extraordinarily " +
        "incomprehensibilities of " * 13).trim)),  // mean word len > 10
      (5L, ("1 2 3 4 5 6 7 8 9 10 " * 6).trim + " the of and or so it is"), // alpha fraction < 0.8
      (6L, ("lorem ipsum dolor sit amet " * 11).trim), // no stopword, AND dup 2-grams
      (7L, ("the cat " * 30).trim)                 // dup 2-gram fraction ≥ 20%
    ).toDF("doc_id", "text")
    val out = CorpusFilters.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(out(1L), "well-formed doc must pass")
    assert(!out(2L), "short doc must fail word-count rule")
    assert(!out(3L), "tiny words must fail mean-word-length rule")
    assert(!out(4L), "huge words must fail mean-word-length rule")
    assert(!out(5L), "digit soup must fail alphabetic-fraction rule")
    assert(!out(6L), "stopword-free doc must fail stopword rule")
    assert(!out(7L), "repeated bigrams must fail duplicate-2-gram rule")
  }

  test("gopher metrics: counts are exact on a hand-computed doc") {
    import spark.implicits._
    val docs = Seq((1L, "The the THE cat sat")).toDF("doc_id", "text")
    val r = CorpusFilters.gopherRules(docs, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Long]("n_distinct_words") == 3L)     // the, cat, sat
    assert(r.getAs[Long]("n_word_chars") == 15L)
    assert(r.getAs[Long]("n_stopwords") == 3L)          // 'the' ×3
    assert(r.getAs[Long]("n_2grams") == 4L)
    assert(r.getAs[Long]("dup_2grams") == 1L)           // "the the" ×2
    assert(r.getAs[Long]("n_3grams") == 3L)
    assert(r.getAs[Long]("dup_3grams") == 0L)
  }

  test("gopher rules: empty and null text never crash and never pass") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = CorpusFilters.gopherRules(docs, "doc_id", "text").collect()
    assert(out.forall(!_.getAs[Boolean]("keep")))
    assert(out.forall(_.getAs[Long]("n_words") == 0L))
  }

  // -------------------------------------------------------- chunk dedup

  test("chunk dedup: duplicated chunk survives only at first occurrence, order kept") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 tokens
    val docs = Seq(
      (1L, shared + " one two three four five six seven eight nine ten"),
      (2L, "uno dos tres cuatro cinco seis siete ocho nueve diez " + shared),
      (3L, shared)
    ).toDF("doc_id", "text")
    val out = CorpusFilters.chunkDedup(docs, "doc_id", "text", chunkTokens = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"), r.getAs[String]("cleaned")))).toMap
    assert(out(1L) == ((2L, 2L, shared + " one two three four five six seven eight nine ten")),
      "doc 1 owns the shared chunk (lowest id)")
    assert(out(2L)._1 == 2L && out(2L)._2 == 1L, "doc 2 loses the shared chunk")
    assert(out(2L)._3 == "uno dos tres cuatro cinco seis siete ocho nueve diez",
      "doc 2 keeps its own chunk only, in order")
    assert(out(3L) == ((1L, 0L, "")), "doc 3 is fully deduplicated")
  }

  test("chunk dedup: within-doc repeats collapse to the first position") {
    import spark.implicits._
    val ten = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val docs = Seq((7L, ten + " " + ten + " " + ten)).toDF("doc_id", "text")
    val r = CorpusFilters.chunkDedup(docs, "doc_id", "text", 10).collect().head
    assert(r.getAs[Long]("n_chunks") == 3L && r.getAs[Long]("n_kept") == 1L)
    assert(r.getAs[String]("cleaned") == ten)
  }

  test("chunk dedup: empty docs survive with empty cleaned text") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "one two")).toDF("doc_id", "text")
    val out = CorpusFilters.chunkDedup(docs, "doc_id", "text", 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("cleaned")).toMap
    assert(out(1L) == "")
    assert(out(2L) == "one two") // short tail chunk is a chunk of its own
  }

  // ------------------------------------------------------ contamination

  test("contamination: planted copy of a train doc is flagged, disjoint doc is not") {
    import spark.implicits._
    // md5-split: ids 44 and 49 land in 'test', most others in 'train'
    // (same bucket rule as Sampling.deterministicSplit at 90/5/5).
    val trainText = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq.tabulate(100) { i =>
      val id = i.toLong
      val text =
        if (id == 44L) trainText                   // test doc, pure copy
        else if (id == 49L) "qq ww ee rr tt yy uu ii oo pp"  // test doc, disjoint
        else trainText
      (id, text)
    }.toDF("doc_id", "text")
    val out = CorpusFilters.contamination(docs, "doc_id", "text",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"), r.getAs[Boolean]("contaminated")))).toMap
    assert(out.contains(44L) && out.contains(49L), s"split fixture drifted: ${out.keySet}")
    val (g44, s44, c44) = out(44L)
    assert(g44 == 10L && s44 == 10L && c44, "verbatim copy must be fully contaminated")
    val (g49, s49, c49) = out(49L)
    assert(g49 == 8L && s49 == 0L && !c49, "disjoint doc must be clean")
  }

  test("contamination: docs with fewer than n words produce no gram rows") {
    import spark.implicits._
    val docs = Seq.tabulate(100) { i => (i.toLong, "only two") }.toDF("doc_id", "text")
    val out = CorpusFilters.contamination(docs, "doc_id", "text",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), n = 3)
    assert(out.count() == 0L, "no test doc has any 3-gram")
  }
}
