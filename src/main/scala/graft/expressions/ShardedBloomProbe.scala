package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Probe of a SHARDED Bloom-filter set shipped as ONE broadcast variable
  * instead of per-shard plan literals.
  *
  * `CorpusFilters.bloomDecontaminate` shards its test-gram filter above
  * the runtime conf clamp; through round 11 every shard's serialized
  * bitset rode the physical plan as a `Literal` inside a CASE chain —
  * measured ~131 MB of plan constants at 18 shards, ~0.5 GB at the
  * 64-shard envelope, serialized into EVERY task: driver/codegen
  * pressure long before the bitsets themselves are a problem. This
  * expression keeps the identical probe semantics (`shard` selects the
  * bitset, `hashed` is tested with Spark's own
  * `BloomFilter.mightContainLong` — the same deserialize-and-test that
  * `BloomFilterMightContain` applies to a literal filter, so flags are
  * byte-identical, `BloomDecontSpec`-pinned across the path boundary)
  * while the `Array[Array[Byte]]` crosses the wire ONCE per executor as
  * a torrent broadcast.
  *
  * Null semantics: null shard/hash → null (BinaryExpression default); a
  * shard index with no filter (no test gram hashed there) → false —
  * exactly the CASE chain's fold-through-false. Deserialization happens
  * lazily once per executor (the `filters` array is transient; the
  * broadcast handle is what serializes with the expression).
  */
case class ShardedBloomProbe(
    left: Expression, right: Expression,
    shards: Broadcast[Array[Array[Byte]]]) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sharded_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint shard, bigint hash), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  @transient private lazy val filters: Array[BloomFilter] =
    shards.value.map(b =>
      if (b == null) null else BloomFilter.readFrom(new ByteArrayInputStream(b)))

  /** Invoked from both interpreted eval and generated code. */
  def probe(shard: Long, hashed: Long): Boolean = {
    val f = filters(shard.toInt)
    f != null && f.mightContainLong(hashed)
  }

  override def nullSafeEval(s: Any, h: Any): Any =
    probe(s.asInstanceOf[Long], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("probe", this, classOf[ShardedBloomProbe].getName)
    nullSafeCodeGen(ctx, ev, (s, h) => s"${ev.value} = $ref.probe($s, $h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShardedBloomProbe =
    copy(left = newLeft, right = newRight)
}
