package graft

import org.apache.spark.util.sketch.BloomFilter

/** Straight-line JVM mirror of q143 (linear-counting distinct estimate)
  * for the SF-scale DuckDB oracle. Exact for the same reason as
  * [[BloomMirror]]: the k=1 Bloom register is a pure bitset, so the
  * distributed partial-merged sketch is byte-identical to this local
  * streamed build, and the estimate — computed by the SAME
  * `CardinalitySketch.linearEstimate` the distributed UDF calls — is
  * deterministic down to the last bit. Replays `xxhash64` (seed 42) and
  * the public `org.apache.spark.util.sketch.BloomFilter`. */
object LinearCountMirror {

  /** q143 contract: per-lang linear count of distinct non-null texts.
    * Input (doc_id, text, lang); output (lang, n_set_bits, est_distinct)
    * ascending by lang. */
  def recompute(docs: Seq[(Long, String, String)], numBits: Long = 1L << 17)
      : Seq[(String, Long, Long)] =
    docs.filter(_._2 != null).groupBy(_._3).toSeq.sortBy(_._1)
      .map { case (lang, ds) =>
        val bf = BloomFilter.create(numBits, numBits) // items == bits ⇒ k = 1
        ds.foreach(d => bf.putLong(SfOracles.xxh64(d._2)))
        val baos = new java.io.ByteArrayOutputStream()
        bf.writeTo(baos)
        val (_, set, est) =
          graft.operators.CardinalitySketch.linearEstimate(baos.toByteArray)
        (lang, set, est)
      }
}
