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

  test("ties spanning slice boundaries still pick the exact positional value") {
    import spark.implicits._
    // 90% of rows share ONE value — the tie run necessarily crosses every
    // range-partition boundary; any row of the run may carry the picked
    // rank but the value at that rank is invariant.
    val tied = (0 until 9000).map(i => ("t", 500L)) ++
      (0 until 500).map(i => ("t", i.toLong)) ++
      (0 until 500).map(i => ("t", 1000L + i))
    val df = tied.toDF("g", "v").repartition(11)
    val got = Quantiles.exactPositional(df, "g", "v", Seq("p50" -> 0.5, "p99" -> 0.99))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    val vs = tied.map(_._2)
    assert(got == (10000L, oracle(vs, 0.5), oracle(vs, 0.99)))
  }

  test("input behind a fresh aggregation shuffle still ranks globally") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // The q138 composition shape that exposed the round-9 hazard: the
    // quantile input is itself the output of a groupBy shuffle, whose
    // row order is nondeterministic across evaluations. Without the
    // operator's internal localCheckpoint, the offsets subtree and the
    // local-rank subtree could range-slice two DIFFERENT orderings of
    // that shuffle (when exchange reuse does not kick in) and the
    // offset+local-rank sum silently stops being a global rank. Heavy
    // ties (97 distinct values over 1000 rows) make a corrupted rank
    // visible as a wrong cutoff instead of a harmless tie shuffle.
    val base = spark.range(200000).toDF("id")
      .withColumn("k", pmod($"id" * 2654435761L, lit(1000L)))
      .groupBy($"k").agg(sum($"id").as("s"))
      .withColumn("g", lit("g"))
      .withColumn("v", pmod($"s", lit(97L)))
    val got = Quantiles.exactPositional(base, "g", "v",
        Seq("c1" -> (1.0 / 3), "c2" -> (2.0 / 3)))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    val vs = base.select($"v").collect().map(_.getLong(0)).toSeq
    assert(got == (vs.size.toLong, oracle(vs, 1.0 / 3), oracle(vs, 2.0 / 3)))
  }

  test("property: quantiles equal the sorted-array oracle on random groups") {
    import spark.implicits._
    import org.scalacheck.Gen
    val gen = for {
      nGroups <- Gen.choose(1, 4)
      rows <- Gen.listOfN(400, for {
        g <- Gen.choose(0, nGroups - 1)
        v <- Gen.choose(-1000L, 1000L)
      } yield (s"g$g", v))
    } yield rows
    (1 to 5).foreach { seedIdx =>
      val rows = gen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seedIdx.toLong)).get
      val got = Quantiles.exactPositional(
        rows.toDF("g", "v").repartition(5), "g", "v",
        Seq("p25" -> 0.25, "p75" -> 0.75))
        .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val vs = grp.map(_._2)
        assert(got(g) == (oracle(vs, 0.25), oracle(vs, 0.75)),
          s"seed $seedIdx group $g")
      }
    }
  }
}
