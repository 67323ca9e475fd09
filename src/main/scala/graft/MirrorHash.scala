package graft

/** Shared mirror-side replicas of small engine contracts that several
  * SF-oracle mirrors replay independently of the operators under test:
  * the `Sampling.hashSample` md5-bucket membership and Spark SQL's
  * double ordering (NaN largest, -0.0 = 0.0). One definition, so a
  * change to either contract is fixed in one place.
  */
private[graft] object MirrorHash {

  /** The 16-bit md5 bucket `Sampling.deterministicSplit` keys on: first
    * 4 hex chars of md5(id.toString bytes). Split semantics only — the
    * sample key below is 32-bit. */
  def md5Bucket4(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    f"${d(0)}%02x${d(1)}%02x"
  }

  /** The 32-bit md5 SAMPLE key `Sampling.hashSample` keys on: first 8
    * hex chars. See Sampling.sampleKey for why the 16-bit grid broke at
    * corpus-scale fractions (class-skewed / empty samples). */
  def md5Bucket8(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    f"${d(0)}%02x${d(1)}%02x${d(2)}%02x${d(3)}%02x"
  }

  /** `Sampling.hashSample` membership: sample key < threshold(fraction). */
  def inHashSample(id: Long, fraction: Double): Boolean =
    fraction >= 1.0 || md5Bucket8(id) < hexThreshold8(fraction)

  def hexThreshold(cum: Double): String =
    f"${math.min(65535, math.floor(cum * 65536).toLong)}%04x"

  def hexThreshold8(cum: Double): String =
    f"${math.min(4294967295L, math.floor(cum * 4294967296.0).toLong)}%08x"

  /** Spark SQL's double comparison: NaN is the LARGEST value and
    * -0.0 equals 0.0 (Spark normalizes signed zeros before comparing).
    * `java.lang.Double.compare` already places NaN above +Inf; only the
    * signed-zero fold is added. */
  def sparkCompare(a: Double, b: Double): Int =
    java.lang.Double.compare(if (a == 0.0) 0.0 else a, if (b == 0.0) 0.0 else b)

  /** Ordering for (score DESC, id ASC) rank windows, with Spark's NaN/
    * signed-zero semantics — NaN ranks FIRST under DESC. */
  val scoreDescIdAsc: Ordering[(Long, Double)] =
    (x: (Long, Double), y: (Long, Double)) => {
      val c = sparkCompare(y._2, x._2)
      if (c != 0) c else java.lang.Long.compare(x._1, y._1)
    }
}
