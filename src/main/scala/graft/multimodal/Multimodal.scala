package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Multimodal column plumbing (builder brief): image/audio/video travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run as partition-local batch transforms.
  *
  * Decode is REAL for the two containers a pure-JVM header walk can parse
  * without codec libraries: uncompressed 24-bit BMP (BITMAPINFOHEADER) and
  * 16-bit PCM WAV (RIFF chunk walk). Features then derive from the actual
  * pixel / sample values. Payloads that are neither (e.g. wrapped text)
  * fall back to a deterministic byte-hash pseudo-vector so the pipeline
  * shape stays testable for arbitrary bytes. Batching is partition-local
  * (one decoder init per partition, the Scala analog of `mapInPandas`
  * batch shape), and the fixed-dim float vector contract feeds the same
  * ANN/dedup operators as the text embeddings.
  */
object Multimodal {

  /** One media row: id + raw bytes + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      format: String,
      feature_dim: Int,
      features: Array[Float])

  /** Fallback pseudo-decoder for payloads that are no parseable container:
    * a deterministic byte-hash vector keeps the pipeline shape (binary in
    * → fixed-dim float out) total over arbitrary bytes. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null) return out
    var i = 0
    while (i < dim) {
      out(i) = MurmurHash3.bytesHash(payload, i).toFloat / Int.MaxValue.toFloat
      i += 1
    }
    out
  }

  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def leI32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Decoded 24-bit image: per-pixel BGR bytes, row-major top-down. */
  final case class DecodedImage(width: Int, height: Int, bgr: Array[Byte])

  /** REAL BMP decode (uncompressed 24-bit BITMAPINFOHEADER, the classic
    * `BM` container): header walk for the pixel-array offset, width,
    * height (negative = top-down) and bpp; rows are 4-byte padded and
    * stored bottom-up unless height is negative. Returns None for
    * anything that is not such a BMP (magic, bpp, compression, bounds). */
  def decodeBmp(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload == null || payload.length < 54) return None
    if (payload(0) != 'B' || payload(1) != 'M') return None
    val pixelOffset = leI32(payload, 10)
    val width = leI32(payload, 18)
    val rawHeight = leI32(payload, 22)
    val bpp = leU16(payload, 28)
    val compression = leI32(payload, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || rawHeight == 0) return None
    val height = math.abs(rawHeight)
    val topDown = rawHeight < 0
    val rowSize = ((width * 3 + 3) / 4) * 4
    if (pixelOffset < 54 || pixelOffset.toLong + rowSize.toLong * height > payload.length)
      return None
    val bgr = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      System.arraycopy(payload, pixelOffset + srcRow * rowSize, bgr, y * width * 3, width * 3)
      y += 1
    }
    Some(DecodedImage(width, height, bgr))
  }

  /** REAL PPM decode (binary `P6`, maxval ≤ 255): ASCII header — magic,
    * optional `#` comment lines, width/height/maxval separated by any
    * whitespace — then one RGB byte triple per pixel. Returns None for
    * non-P6 payloads, 2-byte maxvals, or short pixel data. Pixels are
    * re-ordered to BGR so [[imageFeatures]] is container-agnostic. */
  def decodePpm(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload == null || payload.length < 11) return None
    if (payload(0) != 'P' || payload(1) != '6') return None
    var off = 2
    def skipSpaceAndComments(): Boolean = {
      var progressed = false
      var moving = true
      while (moving && off < payload.length) {
        val c = payload(off)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { off += 1; progressed = true }
        else if (c == '#') {
          while (off < payload.length && payload(off) != '\n') off += 1
          progressed = true
        } else moving = false
      }
      progressed
    }
    def readInt(): Option[Int] = {
      if (!skipSpaceAndComments()) return None
      var v = 0L
      var any = false
      while (off < payload.length && payload(off) >= '0' && payload(off) <= '9') {
        v = v * 10 + (payload(off) - '0'); any = true; off += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    (readInt(), readInt(), readInt()) match {
      case (Some(w), Some(h), Some(maxval))
          if w > 0 && h > 0 && maxval > 0 && maxval < 256 =>
        // exactly ONE whitespace byte after maxval per the spec — but
        // verify it IS whitespace: a missing separator would shift every
        // pixel read by a byte and return silently wrong data instead of
        // None. "\r\n" (Windows writers) counts as one separator.
        if (off >= payload.length) return None
        payload(off) match {
          case ' ' | '\t' | '\n' => off += 1
          case '\r' =>
            off += 1
            if (off < payload.length && payload(off) == '\n') off += 1
          case _ => return None
        }
        if (off.toLong + 3L * w * h > payload.length) return None
        val bgr = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          bgr(i * 3) = payload(off + i * 3 + 2)     // B <- ppm R position swap
          bgr(i * 3 + 1) = payload(off + i * 3 + 1) // G
          bgr(i * 3 + 2) = payload(off + i * 3)     // R
          i += 1
        }
        Some(DecodedImage(w, h, bgr))
      case _ => None
    }
  }

  /** Encode BGR pixels (row-major top-down) as binary PPM `P6` — the
    * exact container [[decodePpm]] reads back. */
  def encodePpm(width: Int, height: Int, bgr: Array[Byte]): Array[Byte] = {
    require(bgr.length == width * height * 3)
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < width * height) {
      out(header.length + i * 3) = bgr(i * 3 + 2)     // R
      out(header.length + i * 3 + 1) = bgr(i * 3 + 1) // G
      out(header.length + i * 3 + 2) = bgr(i * 3)     // B
      i += 1
    }
    out
  }

  /** Encode 16-bit PCM samples as a minimal RIFF/WAVE container — the
    * exact layout [[decodeWav]] walks back. */
  def encodeWavPcm16(samples: Array[Short], channels: Int, sampleRate: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    val dataLen = samples.length * 2
    bos.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(channels); le32(sampleRate)
    le32(sampleRate * channels * 2); le16(channels * 2); le16(16)
    bos.write("data".getBytes("US-ASCII")); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    bos.toByteArray
  }

  /** Decoded PCM audio: 16-bit samples (channels interleaved). */
  final case class DecodedAudio(channels: Int, sampleRate: Int, samples: Array[Short])

  /** REAL WAV decode (RIFF/WAVE chunk walk, PCM 16-bit): finds the `fmt `
    * and `data` chunks wherever they sit, honoring chunk sizes and word
    * alignment. Returns None for non-RIFF payloads or non-16-bit-PCM
    * encodings. */
  def decodeWav(payload: Array[Byte]): Option[DecodedAudio] = {
    if (payload == null || payload.length < 44) return None
    def tag(o: Int, s: String): Boolean =
      s.indices.forall(i => payload(o + i) == s(i).toByte)
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (audioFormat, channels, rate)
    var bits = 0
    var data: Option[(Int, Int)] = None // (offset, size)
    while (off + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
      val size = leI32(payload, off + 4)
      if (size < 0 || off + 8 + size > payload.length) return None
      if (tag(off, "fmt ") && size >= 16) {
        fmt = Some((leU16(payload, off + 8), leU16(payload, off + 10), leI32(payload, off + 12)))
        bits = leU16(payload, off + 22)
      } else if (tag(off, "data")) data = Some((off + 8, size))
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, ch, rate)), Some((dOff, dSize))) if bits == 16 && ch > 0 =>
        val n = dSize / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = leU16(payload, dOff + 2 * i).toShort; i += 1 }
        Some(DecodedAudio(ch, rate, samples))
      case _ => None
    }
  }

  /** Image features from decoded pixels: [mean B, mean G, mean R] (0..1)
    * then a (dim−3)-bucket normalized luma histogram. Pure integer
    * accumulation then one float division per slot — deterministic. */
  def imageFeatures(img: DecodedImage, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val nPx = img.width * img.height
    if (nPx == 0 || dim < 3) return out
    val sums = new Array[Long](3)
    val nBuckets = dim - 3
    val hist = new Array[Long](math.max(1, nBuckets))
    var i = 0
    while (i < nPx) {
      val b = img.bgr(3 * i) & 0xff
      val g = img.bgr(3 * i + 1) & 0xff
      val r = img.bgr(3 * i + 2) & 0xff
      sums(0) += b; sums(1) += g; sums(2) += r
      if (nBuckets > 0) hist(((b + g + r) / 3) * nBuckets / 256) += 1
      i += 1
    }
    var k = 0
    while (k < 3) { out(k) = (sums(k).toDouble / nPx / 255.0).toFloat; k += 1 }
    var j = 0
    while (j < nBuckets) { out(3 + j) = (hist(j).toDouble / nPx).toFloat; j += 1 }
    out
  }

  /** Audio features from decoded samples: [RMS, mean, zero-crossing rate]
    * then a (dim−3)-bucket normalized |amplitude| histogram. */
  def audioFeatures(audio: DecodedAudio, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = audio.samples.length
    if (n == 0 || dim < 3) return out
    var sumSq = 0.0; var sum = 0L; var crossings = 0L
    val nBuckets = dim - 3
    val hist = new Array[Long](math.max(1, nBuckets))
    var i = 0
    while (i < n) {
      val s = audio.samples(i).toInt
      sumSq += s.toDouble * s; sum += s
      if (i > 0 && ((s >= 0) != (audio.samples(i - 1) >= 0))) crossings += 1
      if (nBuckets > 0) hist(math.min(math.abs(s), 32767) * nBuckets / 32768) += 1
      i += 1
    }
    out(0) = (math.sqrt(sumSq / n) / 32768.0).toFloat
    out(1) = (sum.toDouble / n / 32768.0).toFloat
    out(2) = (crossings.toDouble / math.max(1, n - 1)).toFloat
    var j = 0
    while (j < nBuckets) { out(3 + j) = (hist(j).toDouble / n).toFloat; j += 1 }
    out
  }

  /** Container-sniffing decode: BMP, PPM and WAV payloads yield features
    * of their actual pixels/samples; anything else takes the byte-hash
    * fallback. Total — never throws on hostile bytes. */
  def decode(payload: Array[Byte], dim: Int): Array[Float] =
    decodeBmp(payload).map(imageFeatures(_, dim))
      .orElse(decodePpm(payload).map(imageFeatures(_, dim)))
      .orElse(decodeWav(payload).map(audioFeatures(_, dim)))
      .getOrElse(decodeStub(payload, dim))

  /** Exact integer pixel statistics from a decoded image — the
    * oracle-facing projection of [[imageFeatures]]: per-channel byte sums,
    * pixel count, and the count of pixels landing in luma-histogram
    * bucket 0 (same `((b+g+r)/3)*nBuckets/256` bucketing). All-integer so
    * an independent engine recomputing from the source bytes matches
    * bit-for-bit (q44's DuckDB oracle does, proving the
    * encode→decode→pixel-walk round trip lossless). */
  final case class ImageStats(
      media_id: Long, format: String, width: Int, height: Int,
      n_px: Long, sum_b: Long, sum_g: Long, sum_r: Long, lum0: Long)

  /** Partition-local REAL BMP decode + exact pixel stats; rows whose
    * payload is not a valid 24-bit BMP are dropped (total function,
    * never throws). Same batch shape as [[extractFeatures]]. */
  def exactImageStats(media: Dataset[MediaRecord], nBuckets: Int = 13): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeBmp(r.payload).map { img =>
          var sb = 0L; var sg = 0L; var sr = 0L; var l0 = 0L
          val nPx = img.width * img.height
          var i = 0
          while (i < nPx) {
            val b = img.bgr(3 * i) & 0xff
            val g = img.bgr(3 * i + 1) & 0xff
            val rr = img.bgr(3 * i + 2) & 0xff
            sb += b; sg += g; sr += rr
            if (((b + g + rr) / 3) * nBuckets / 256 == 0) l0 += 1
            i += 1
          }
          ImageStats(r.media_id, r.format, img.width, img.height, nPx.toLong, sb, sg, sr, l0)
        }
      }
    }
  }

  /** One row of the decode-golden surface (q122): container routed to,
    * unit count (pixels / samples), and three exact integer stats —
    * channel sums for images, (sum, sum-of-squares, zero-crossings) for
    * audio. Undecodable payloads row as ('none', 0, 0, 0, 0). */
  final case class MediaGolden(
      case_id: String, container: String, n_units: Long, s1: Long, s2: Long, s3: Long)

  /** The pinned golden payload set: every decoder (BMP, PPM incl. the
    * CRLF-after-maxval form, PCM WAV) plus two must-reject cases. Inputs
    * are built by the same encoders the round-trip specs use; the
    * EXPECTED stats are pinned as a VALUES oracle in SparkEntry — green
    * puts all three real decoders on the driver-checked surface. */
  def goldenPayloads: Seq[(String, Array[Byte])] = {
    val bgr22 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val bgr21 = Array[Byte](10, 20, 30, 40, 50, 60)
    val ppmPlain = encodePpm(2, 1, bgr21)
    val ppmCrlf = "P6\n2 1\n255\r\n".getBytes("US-ASCII") ++
      ppmPlain.drop("P6\n2 1\n255\n".length)
    Seq(
      "bmp_2x2" -> encodeBmp(2, 2, bgr22),
      "ppm_2x1" -> ppmPlain,
      "ppm_crlf" -> ppmCrlf,
      "wav_pcm" -> encodeWavPcm16(Array[Short](1000, -1000, 2000, -3000), 1, 8000),
      "bmp_truncated" -> encodeBmp(2, 2, bgr22).take(20),
      "text_bytes" -> "hello".getBytes("UTF-8"))
  }

  /** Container-sniffing decode to exact integer stats (see [[MediaGolden]]). */
  def goldenStats(caseId: String, payload: Array[Byte]): MediaGolden = {
    def imgStats(container: String, img: DecodedImage): MediaGolden = {
      var sb = 0L; var sg = 0L; var sr = 0L
      val nPx = img.width * img.height
      var i = 0
      while (i < nPx) {
        sb += img.bgr(3 * i) & 0xff
        sg += img.bgr(3 * i + 1) & 0xff
        sr += img.bgr(3 * i + 2) & 0xff
        i += 1
      }
      MediaGolden(caseId, container, nPx.toLong, sb, sg, sr)
    }
    decodeBmp(payload).map(imgStats("bmp", _))
      .orElse(decodePpm(payload).map(imgStats("ppm", _)))
      .orElse(decodeWav(payload).map { a =>
        var sum = 0L; var sumSq = 0L; var crossings = 0L
        var i = 0
        while (i < a.samples.length) {
          val s = a.samples(i).toLong
          sum += s; sumSq += s * s
          if (i > 0 && ((s >= 0) != (a.samples(i - 1) >= 0))) crossings += 1
          i += 1
        }
        MediaGolden(caseId, "wav", a.samples.length.toLong, sum, sumSq, crossings)
      })
      .getOrElse(MediaGolden(caseId, "none", 0L, 0L, 0L, 0L))
  }

  /** Partition-local batch feature extraction. The decoder "model" is
    * initialized once per partition (the expensive step at scale), then
    * applied to every record in that partition's iterator — never
    * per-row init, never a driver-side loop. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // one-time per-partition init point (decoder/model handle at scale)
      it.map { r =>
        MediaFeatures(r.media_id, r.format, dim, decode(r.payload, dim))
      }
    }
  }

  /** Encode BGR pixel bytes (row-major top-down) as an uncompressed
    * 24-bit BMP — the exact container [[decodeBmp]] reads back. Used by
    * [[textAsBmp]] and the round-trip spec. */
  def encodeBmp(width: Int, height: Int, bgr: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && bgr.length == width * height * 3)
    val rowSize = ((width * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + rowSize * height)
    def putU16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def putI32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putI32(2, out.length); putI32(10, 54); putI32(14, 40)
    putI32(18, width); putI32(22, height)
    putU16(26, 1); putU16(28, 24); putI32(30, 0); putI32(34, rowSize * height)
    var y = 0
    while (y < height) { // bottom-up storage
      System.arraycopy(bgr, (height - 1 - y) * width * 3, out, 54 + y * rowSize, width * 3)
      y += 1
    }
    out
  }

  /** STUB resize: a real implementation decodes, resamples to
    * `targetW`×`targetH` and re-encodes; this transforms the payload
    * deterministically (truncate/patch) so the metadata/payload contract —
    * new dimensions travel WITH the new bytes — is exercised for real. */
  def resizeStub(media: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val p = if (r.payload == null) Array.emptyByteArray
          else r.payload.take(math.max(1, math.min(r.payload.length, targetW * targetH)))
        r.copy(payload = p, width = targetW, height = targetH)
      }
    }
  }

  final case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])

  /** STUB frame sampling: one media row explodes into every `stride`-th
    * "frame" (payload slices stand in for decoded frames). The 1→N row
    * shape is the real contract — downstream per-frame feature extraction
    * and dedup operate on the exploded rows, partitioned by media_id. */
  def frameSampleStub(media: Dataset[MediaRecord], stride: Int, frameSize: Int = 16): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.payload == null || r.payload.isEmpty) Iterator.empty
      else r.payload.grouped(frameSize).zipWithIndex.collect {
        case (bytes, i) if i % stride == 0 => Frame(r.media_id, i, bytes)
      }
    }
  }

  /** Render each document's utf-8 bytes as the pixel data of a REAL 8-px-
    * wide 24-bit BMP (3 chars per pixel, zero-padded tail) — so the shipped
    * feature query decodes an actual image container per row, not a
    * pass-through blob. Runs in the same partition-local batch shape as
    * [[extractFeatures]]. */
  def textAsBmp(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    val w = 8
    docs.select(col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val h = math.max(1, (bytes.length + w * 3 - 1) / (w * 3))
          val bgr = java.util.Arrays.copyOf(bytes, w * h * 3)
          MediaRecord(id, encodeBmp(w, h, bgr), "image/bmp", w, h)
        }
      }
  }

  /** Wrap a text DataFrame as fake media records (payload = utf-8 bytes) —
    * lets the binary-column pipeline run against the documents table. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("format"),
      col("n_chars").cast("int").as("width"),
      lit(1).as("height"))
      .as[MediaRecord]
  }
}
