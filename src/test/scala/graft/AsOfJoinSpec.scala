package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import SparkSuiteBase.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:00:05")),
      (2L, 100L, ts("2024-01-01 10:01:00")),
      (3L, 200L, ts("2024-01-01 10:00:30")),
      (4L, 300L, ts("2024-01-01 10:00:00")) // key with no quotes at all
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      (100L, ts("2024-01-01 10:00:00"), 10.0),
      (100L, ts("2024-01-01 10:00:05"), 11.0), // equal ts: inclusive
      (100L, ts("2024-01-01 10:00:59"), 12.0),
      (200L, ts("2024-01-01 10:01:00"), 99.0) // after the only 200-trade
    ).toDF("sym", "ts", "price")

    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", Seq("price"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[Any]("asof_price")).map(_.asInstanceOf[Double])).toMap

    assert(out(1L).contains(11.0), "equal-timestamp quote must match (inclusive)")
    assert(out(2L).contains(12.0), "latest at-or-before wins")
    assert(out(3L).isEmpty, "quote strictly after the trade must not match")
    assert(out(4L).isEmpty, "key with no right rows gets null")
  }

  test("NULL payload in the nearest row is carried as-is and never un-masked by older rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // nearest row (10:00) has a NULL payload; an older row (08:00) has A.
    // The matched ROW is atomic: asOf must return NULL (nearest row's own
    // value), and asOfWithin(1h) must also return NULL for a 10:30 probe —
    // a per-column carry would leak the 2.5h-stale A as "fresh".
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), Option("A")),
      (1L, ts("2024-01-01 10:00:00"), None: Option[String])
    ).toDF("k", "ts", "v")
    val left = Seq((100L, 1L, ts("2024-01-01 10:30:00"))).toDF("probe_id", "k", "ts")

    val plain = AsOfJoin.asOf(left, right, "k", "ts", Seq("v")).collect()
    assert(plain.head.isNullAt(plain.head.fieldIndex("asof_v")),
      "nearest row's NULL payload must be returned, not an older row's value")

    val within = AsOfJoin.asOfWithin(left, right, "k", "ts", Seq("v"),
      expr("INTERVAL 1 HOUR")).collect()
    assert(within.head.isNullAt(within.head.fieldIndex("asof_v")))

    // and a fresh non-null nearest row still comes through under tolerance
    val right2 = Seq((1L, ts("2024-01-01 10:00:00"), Option("B"))).toDF("k", "ts", "v")
    val within2 = AsOfJoin.asOfWithin(left, right2, "k", "ts", Seq("v"),
      expr("INTERVAL 1 HOUR")).collect()
    assert(within2.head.getAs[String]("asof_v") == "B")
  }

  test("left rows and columns are preserved exactly") {
    import spark.implicits._
    val l = Seq((1L, "a", ts("2024-01-01 00:00:01"))).toDF("id", "tag", "ts")
    val r = Seq((9L, ts("2024-01-01 00:00:00"), 5)).toDF("id2", "ts", "x")
      .withColumnRenamed("id2", "id")
    // key join on "id" with no overlap: left survives with null payload
    val out = AsOfJoin.asOf(l, r, "id", "ts", Seq("x")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("id") == 1L && out.head.getAs[String]("tag") == "a")
    assert(out.head.isNullAt(out.head.fieldIndex("asof_x")))
  }
}
