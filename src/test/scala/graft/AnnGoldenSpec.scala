package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Knn

/** Margin + cross-check guard for the q126 ANN golden: the construction
  * must leave a wide gap between planted neighbors and everything else
  * (that gap is what makes approximate recovery certain rather than
  * probable), and every distributed path must reproduce the JVM-exact
  * expectations. */
class AnnGoldenSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb)
  }

  test("construction margins: planted ≈ 1, all other pairs far below") {
    val all = AnnGolden.vectors.toMap
    AnnGolden.queryIds.foreach { q =>
      val planted = cosine(all(q), all(AnnGolden.PlantedOffset + q))
      assert(planted > 0.9999, s"query $q planted cosine $planted")
    }
    val nonPlanted = for {
      (ia, va) <- AnnGolden.vectors; (ib, vb) <- AnnGolden.vectors
      if ia < ib && ib != ia + AnnGolden.PlantedOffset
    } yield cosine(va, vb)
    val worst = nonPlanted.max
    assert(worst < 0.9, s"non-planted pair cosine $worst erodes the margin")
    assert(AnnGolden.expectedTopK == AnnGolden.queryIds.map(q => q -> (AnnGolden.PlantedOffset + q)))
    assert(AnnGolden.expectedPairs == AnnGolden.queryIds.map(q => (q, AnnGolden.PlantedOffset + q)))
  }

  test("distributed LSH / IVF / near-dup paths reproduce the JVM-exact answers") {
    import spark.implicits._
    val got = Queries.annGolden(spark, SparkSuiteBase.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want =
      (AnnGolden.expectedTopK.map { case (q, n) => ("ivf", q, n) } ++
        AnnGolden.expectedTopK.map { case (q, n) => ("lsh", q, n) } ++
        AnnGolden.expectedPairs.map { case (a, b) => ("pairs", a, b) }).sorted
    assert(got == want)
  }
}
