package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pins the Spark SQL double-comparison semantics the kNN mirrors
  * replicate ([[MirrorHash]]): NaN is the LARGEST value (ranks first
  * under `desc`, passes `>= τ`), and -0.0 equals 0.0. These are
  * MEASURED against the engine, not assumed — if a Spark upgrade ever
  * changes them, this fails before any oracle drifts. */
class MirrorHashSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, Double.NaN), (2L, 1.0), (3L, -0.0), (4L, 0.0),
    (5L, Double.PositiveInfinity), (6L, -1.0), (7L, Double.NegativeInfinity))

  test("window rank order (score desc, id asc) matches MirrorHash.scoreDescIdAsc") {
    val w = Window.orderBy($"score".desc, $"id".asc)
    val got = rows.toDF("id", "score")
      .withColumn("rnk", row_number().over(w))
      .collect().map(r => (r.getInt(2), r.getLong(0))).sortBy(_._1).map(_._2).toSeq
    val want = rows.map { case (id, s) => (id, s) }
      .sorted(MirrorHash.scoreDescIdAsc).map(_._1)
    assert(got == want, s"Spark order $got vs mirror order $want")
    // NaN must be first and the signed zeros tie-broken by id
    assert(got.head == 1L, "NaN ranks first under desc")
    assert(got.indexOf(3L) + 1 == got.indexOf(4L), "-0.0 and 0.0 are equal, id-tie-broken")
  }

  test("NaN passes >= threshold (Spark treats NaN as larger than any value)") {
    val kept = rows.toDF("id", "score").filter($"score" >= 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L), s"got $kept")
  }

  test("sparkCompare totals: NaN > +Inf > 1 > 0 = -0 > -1 > -Inf") {
    import MirrorHash.sparkCompare
    assert(sparkCompare(Double.NaN, Double.PositiveInfinity) > 0)
    assert(sparkCompare(Double.PositiveInfinity, 1.0) > 0)
    assert(sparkCompare(0.0, -0.0) == 0)
    assert(sparkCompare(-1.0, Double.NegativeInfinity) > 0)
  }
}
