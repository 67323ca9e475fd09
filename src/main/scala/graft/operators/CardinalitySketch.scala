package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-invariant distinct-count sketching: LINEAR COUNTING
  * (Whang et al. 1990) on a plain bitset, built with Spark's own
  * `bloom_filter_agg` forced to k = 1 hash function.
  *
  * Why this exists next to `approx_count_distinct`/HLL (q63/q98): HLL's
  * HIP estimator is merge-ORDER-sensitive — the same rows under a
  * different partitioning give different sketch bytes, so those queries
  * can only ever be rows-only checked. A bitset is the degenerate sketch
  * whose merge (bitwise OR) is associative, commutative AND idempotent:
  * the distributed partial-merged register is byte-identical to a local
  * streamed build, so the estimate — and every intermediate bit — is
  * deterministic and externally oracle-able (the q141 insight applied to
  * cardinality; `LinearCountMirror` replays it exactly).
  *
  * k = 1 is forced by passing `estimatedNumItems == numBits` to the
  * aggregate: Spark sizes `k = max(1, round(numBits/items·ln2)) = 1`,
  * which turns the Bloom filter into a pure linear-counting register.
  * The estimate is the standard −m·ln(z/m) with z = zero bits, good to
  * a few % while the register is ≲ 70% full; size `numBits` ≳ the
  * expected distinct count (8 KB per group at the 2¹⁷ default covers
  * ~100k distincts).
  *
  * 100 TB shape: one groupBy shuffle whose per-group state is a fixed
  * `numBits/8`-byte buffer that partial-merges map-side — the same cost
  * class as HLL, with determinism HLL cannot offer.
  */
object CardinalitySketch {

  /** Parse a serialized `org.apache.spark.util.sketch.BloomFilter`
    * (v1: version, k, numWords, words…; v2 — what Spark 4's
    * `create(items, bits)` emits — inserts a seed int after k; all
    * big-endian) and return (mBits, setBits, linear-counting estimate).
    * Shared verbatim by the distributed estimate UDF and
    * `LinearCountMirror`, so both sides of the oracle compare run the
    * identical arithmetic. */
  def linearEstimate(sketchBytes: Array[Byte]): (Long, Long, Long) = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(sketchBytes))
    val version = in.readInt()
    require(version == 1 || version == 2,
      s"unexpected BloomFilter serial version $version")
    val k = in.readInt()
    if (version == 2) in.readInt() // seed (0 for create(items, bits))
    require(k == 1,
      s"linear counting needs k=1 hash function, sketch has $k — " +
        "was the aggregate built with estimatedNumItems == numBits?")
    val numWords = in.readInt()
    var set = 0L
    var i = 0
    while (i < numWords) { set += java.lang.Long.bitCount(in.readLong()); i += 1 }
    val m = numWords.toLong * 64L // BitArray's effective modulo
    val z = m - set
    val est =
      if (z == 0L) math.round(m.toDouble * StrictMath.log(m.toDouble)) // saturated: documented ceiling
      else math.round(-m.toDouble * StrictMath.log(z.toDouble / m))
    (m, set, est)
  }

  /** Per-group linear-counting distinct estimate of `valueCol` (nulls
    * ignored): returns `groupCols ++ (n_set_bits, est_distinct)`.
    * `numBits` must be a multiple of 64 and under the session's
    * runtime.bloomFilter conf caps — the aggregate would otherwise
    * silently clamp and break k = 1 (checked loudly here). */
  def linearCount(df: DataFrame, groupCols: Seq[String], valueCol: String,
      numBits: Long = 1L << 17): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(numBits >= 64 && numBits % 64 == 0, s"numBits must be a multiple of 64: $numBits")
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val spark = df.sparkSession
    require(numBits <= CorpusFilters.bloomConfMaxItems(spark) &&
      numBits <= CorpusFilters.bloomConfMaxBits(spark),
      s"numBits=$numBits exceeds the session's runtime.bloomFilter conf caps — " +
        "the aggregate would silently clamp and change the register size/k")
    val bfAgg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(valueCol))),
      Literal(numBits), Literal(numBits)).toAggregateExpression())
    val est = udf((b: Array[Byte]) =>
      if (b == null) (0L, 0L) // group whose every value was null
      else { val (_, s, e) = linearEstimate(b); (s, e) })
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(bfAgg.as("sk"))
      .withColumn("lc", est(col("sk")))
      .select(groupCols.map(col) :+
        col("lc._1").as("n_set_bits") :+ col("lc._2").as("est_distinct"): _*)
  }
}
