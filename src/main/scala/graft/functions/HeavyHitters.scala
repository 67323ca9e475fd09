package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a typed Spark `Aggregator` — the
  * custom-aggregate (UDAF) surface of the engine.
  *
  * Tracks at most `capacity` counters; any token with true frequency
  * > N/capacity is guaranteed to survive, and every reported count is an
  * undercount by at most N/capacity. When `capacity` exceeds the number of
  * distinct tokens no decrement ever fires and the counts are EXACT —
  * which is how the q47 query is oracle-checked against a plain GROUP BY.
  *
  * At 100 TB this replaces a full token groupBy (shuffle of every token
  * occurrence) with one fixed-size map per partition merged pairwise —
  * the classic sketch trade: bounded memory, bounded error, one pass.
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[Seq[String], mutable.Map[String, Long], Seq[(String, Long)]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(
      buf: mutable.Map[String, Long], tokens: Seq[String]): mutable.Map[String, Long] = {
    if (tokens != null) tokens.foreach { t =>
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None if buf.size < capacity => buf.update(t, 1L)
        case None => // Misra–Gries decrement: all counters down one
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (k, c) => if (c == 1L) dead += k else buf.update(k, c - 1) }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything
      val d = a.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (k, c) => if (c - d <= 0L) dead += k else a.update(k, c - d) }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
