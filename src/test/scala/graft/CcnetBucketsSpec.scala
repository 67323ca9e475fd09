package graft

import org.scalatest.funsuite.AnyFunSuite

/** q138 CCNet perplexity bucketing: structural properties on sf0.001.
  * Value-exactness is the DuckDB oracle's job (the whole pipeline is
  * integer arithmetic + one shared ceil(p·n) expression); this spec pins
  * the bucketing contract itself. */
class CcnetBucketsSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("terciles cover the corpus, in order, with value-tied buckets") {
    val rows = Queries.ccnetBuckets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    val n = rows.length
    val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    // cutoff-by-value semantics: every head ppl ≤ every middle ppl ≤
    // every tail ppl, and head holds at least the first tercile position
    // (ties can only GROW the lower bucket, never shrink it)
    val headMax = byBucket.get("head").map(_.max)
    val midMax = byBucket.get("middle").map(_.max)
    for (h <- headMax; m <- byBucket.get("middle")) assert(h <= m.min)
    for (m <- midMax; t <- byBucket.get("tail")) assert(m <= t.min)
    assert(byBucket.getOrElse("head", Array.empty[Long]).length >=
      math.ceil(n / 3.0).toInt - 1)
    // per-doc ppl is the integer floor division of the q134 LM totals
    val lm = Queries.lmPerplexity(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (id, ppl, _) =>
      val (nb, nll) = lm(id)
      assert(nb > 0 && ppl == nll / nb, s"doc $id")
    }
    assert(rows.length == lm.count(_._2._1 > 0), "all scored docs bucketed")
  }
}
