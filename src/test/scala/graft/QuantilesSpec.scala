package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantiles

/** Unit contract for the range-partitioned exact-quantile operator, against
  * a literal sorted-array oracle computed in the spec — guards the q68
  * semantics independent of the DuckDB gate: rank = ceil(p·n) positional
  * pick (no interpolation), correct across slice boundaries and under a
  * hot group spanning many slices.
  */
class QuantilesSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  private def oracle(vals: Seq[Long], p: Double): Long = {
    val s = vals.sorted
    s(math.ceil(p * s.size).toInt - 1)
  }

  test("positional quantiles match the sorted-array oracle, hot group included") {
    import spark.implicits._
    // hot group: 10_007 rows (prime, spans every slice); cold groups: 13 and 1
    val hot = (0 until 10007).map(i => ("hot", ((i * 2654435761L) % 99991L)))
    val cold = (0 until 13).map(i => ("cold", i.toLong * 7))
    val one = Seq(("one", 42L))
    val df = (hot ++ cold ++ one).toDF("g", "v")
      .repartition(7) // misaligned input partitioning on purpose
    val got = Quantiles.exactPositional(df, "g", "v",
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val hv = hot.map(_._2)
    assert(got("hot") == (10007L, oracle(hv, 0.5), oracle(hv, 0.9), oracle(hv, 0.99)))
    val cv = cold.map(_._2)
    assert(got("cold") == (13L, oracle(cv, 0.5), oracle(cv, 0.9), oracle(cv, 0.99)))
    // n=1: every quantile is the single value
    assert(got("one") == (1L, 42L, 42L, 42L))
  }
}
