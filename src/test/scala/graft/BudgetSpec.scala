package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Budget

/** Contract battery for token-budget selection (q145): hand-computed
  * prefix semantics (greedy include-self ≤ budget, (score desc, id asc)
  * tie order), budget edges, partitioning invariance, and agreement with
  * the naive single-window formulation on a corpus large enough to span
  * many range slices. */
class BudgetSpec extends AnyFunSuite {
  import SparkSuiteBase.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], budget: Long) =
    Budget.selectByBudget(
        rows.toDF("id", "score", "w"), "id", "score", "w", budget)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1).toSeq

  test("hand-computed prefix: greedy include-self, crossing doc excluded") {
    // order by (score desc, id): id 3 (s9,w4) -> id 1 (s7,w5) -> id 2 (s7,w5)
    //   -> id 4 (s1,w2); cums 4, 9, 14, 16. budget 9: ids 3,1 selected —
    // id 2 CROSSES (14 > 9) and id 4 would fit alone (4+5+2=11 > 9 too,
    // but greedy-prefix means it is excluded regardless)
    val got = run(Seq((1L, 7L, 5L), (2L, 7L, 5L), (3L, 9L, 4L), (4L, 1L, 2L)), 9L)
    assert(got == Seq((1L, 9L, true), (2L, 14L, false), (3L, 4L, true), (4L, 16L, false)))
  }

  test("tie on score breaks by ascending id") {
    val got = run(Seq((10L, 5L, 3L), (2L, 5L, 3L), (7L, 5L, 3L)), 6L)
    // order: 2, 7, 10 — cums 3, 6, 9
    assert(got == Seq((2L, 3L, true), (7L, 6L, true), (10L, 9L, false)))
  }

  test("budget edges: zero budget selects nothing, huge budget everything") {
    val rows = Seq((1L, 3L, 2L), (2L, 2L, 2L))
    assert(run(rows, 0L).forall(!_._3))
    assert(run(rows, 1000L).forall(_._3))
    intercept[IllegalArgumentException] {
      Budget.selectByBudget(rows.toDF("id", "score", "w"), "id", "score", "w", -1L)
    }
  }

  test("matches the naive global window across many range slices, any partitioning") {
    // 10k rows over 32 shuffle partitions: score collides heavily (1000
    // distinct values) so ties cross slice boundaries; weights vary
    val df = spark.range(10000).select(
      $"id",
      pmod(xxhash64($"id"), lit(1000L)).as("score"),
      (pmod(xxhash64($"id", lit(1)), lit(50L)) + 1L).as("w"))
    val budget = 10000L * 25L / 2L
    val got = Budget.selectByBudget(df, "id", "score", "w", budget)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq
    val naive = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (-s, id) }
      .scanLeft((0L, 0L, 0L, false)) { case ((_, _, acc, _), (id, s, w)) =>
        (id, s, acc + w, acc + w <= budget)
      }.drop(1).map { case (id, _, cum, sel) => (id, cum, sel) }
      .sortBy(_._1).toSeq
    assert(got == naive)
    val repart = Budget.selectByBudget(df.repartition(7), "id", "score", "w", budget)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq
    assert(repart == got)
  }

  test("per-group: hand-computed prefixes per group, half-budget cross-multiply") {
    // group A total 10 -> budget 5: (score desc, id) order A2(w=3,s=9),
    // A1(w=4,s=5), A3(w=3,s=1) -> cum 3 selected, 7 not, 10 not.
    // group B total 8 -> budget 4: B1(w=4,s=7) cum 4 selected (4*2<=8),
    // B2(w=4,s=3) cum 8 not.
    val rows = Seq(
      ("A", 1L, 5L, 4L), ("A", 2L, 9L, 3L), ("A", 3L, 1L, 3L),
      ("B", 4L, 7L, 4L), ("B", 5L, 3L, 4L))
    val got = Budget.selectByBudgetPerGroup(
        rows.toDF("g", "id", "score", "w"), "g", "id", "score", "w", 1L, 2L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 10L, 7L, false), (2L, 10L, 3L, true), (3L, 10L, 10L, false),
      (4L, 8L, 4L, true), (5L, 8L, 8L, false)))
  }

  test("per-group matches naive per-group windows across slices; viral group spreads") {
    // 20k rows, 5 groups with one VIRAL group holding 60% of all rows —
    // the shape that kills a window-per-group plan; ties cross slices
    val df = spark.range(20000).select(
      when(pmod($"id", lit(10L)) < 6, lit("HOT"))
        .otherwise(concat(lit("g"), pmod($"id", lit(4L)))).as("g"),
      $"id",
      pmod(xxhash64($"id"), lit(500L)).as("score"),
      (pmod(xxhash64($"id", lit(1)), lit(50L)) + 1L).as("w"))
    val got = Budget.selectByBudgetPerGroup(df, "g", "id", "score", "w", 1L, 2L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .sortBy(_._1).toSeq
    val naive = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val tot = rs.map(_._4).sum
        var acc = 0L
        rs.sortBy { case (_, id, s, _) => (-s, id) }.map { case (_, id, _, w) =>
          acc += w
          (id, tot, acc, acc * 2L <= tot)
        }
      }.sortBy(_._1).toSeq
    assert(got == naive)
    val repart = Budget.selectByBudgetPerGroup(
        df.repartition(7), "g", "id", "score", "w", 1L, 2L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .sortBy(_._1).toSeq
    assert(repart == got)
  }

  test("per-group: NULL group values are one ordinary group, never dropped " +
      "(round-12 ADVICE: the offsets join is null-safe)") {
    val rows = Seq(
      (Some("A"), 1L, 5L, 4L), (Some("A"), 2L, 9L, 3L),
      (None, 3L, 8L, 2L), (None, 4L, 6L, 2L), (None, 5L, 1L, 2L))
    val df = rows.map { case (g, id, s, w) => (g.orNull, id, s, w) }
      .toDF("g", "id", "score", "w")
    val got = Budget.selectByBudgetPerGroup(df, "g", "id", "score", "w", 1L, 2L)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))
      .sortBy(_._2).toSeq
    // CONTRACT: one row per input row — null-group rows included
    assert(got.map(_._2) == Seq(1L, 2L, 3L, 4L, 5L))
    // null group total 6 (cum·2 <= 6): id 3 cum 2 selected, id 4 cum 4
    // not, id 5 cum 6 not; group A total 7 (cum·2 <= 7): id 2 (s=9)
    // cum 3 selected, id 1 cum 7 not
    assert(got == Seq(
      (Some("A"), 1L, 7L, 7L, false), (Some("A"), 2L, 7L, 3L, true),
      (None, 3L, 6L, 2L, true), (None, 4L, 6L, 4L, false),
      (None, 5L, 6L, 6L, false)))
  }

  test("per-group: corpus-scale cross-multiply does not overflow Long " +
      "(decimal(38,0) products)") {
    // cum_w · budgetDen ≈ 6e18 · 1e4 = 6e22 >> Long.MaxValue: the old
    // BIGINT product wrapped negative and flipped `selected`
    val big = 3000000000000000000L // 3e18
    val rows = Seq(("G", 1L, 9L, big), ("G", 2L, 5L, big))
    val got = Budget.selectByBudgetPerGroup(
        rows.toDF("g", "id", "score", "w"), "g", "id", "score", "w",
        5000L, 10000L) // exactly half the group's 6e18 total
      .collect()
      .map(r => (r.getLong(1), r.getLong(5), r.getBoolean(6)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, big, true), (2L, 2L * big, false)))
  }
}
