package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkSuiteBase.{spark, sfDir}

  test("binary payload pipeline: schema, dims, determinism") {
    val media = Multimodal.fromDocuments(Tables(spark, sfDir, "documents"))
    val feats = Multimodal.extractFeatures(media, dim = 16)
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(_.feature_dim == 16))
    assert(rows.forall(_.format == "text/plain"))
    // determinism: same payload ⇒ same features
    val again = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (x, y) => x.features.sameElements(y.features) })
  }

  test("resize updates metadata and payload together") {
    val media = Multimodal.fromDocuments(Tables(spark, sfDir, "documents"))
    val resized = Multimodal.resizeStub(media, 8, 4).collect()
    assert(resized.forall(r => r.width == 8 && r.height == 4))
    assert(resized.forall(_.payload.length <= 32))
  }

  test("frame sampling explodes one media row into strided frames") {
    val media = Multimodal.fromDocuments(Tables(spark, sfDir, "documents"))
    val frames = Multimodal.frameSampleStub(media, stride = 2, frameSize = 16)
    val byMedia = frames.collect().groupBy(_.media_id)
    assert(byMedia.nonEmpty)
    byMedia.values.foreach { fs =>
      assert(fs.forall(_.frame_no % 2 == 0), "only every 2nd frame sampled")
      assert(fs.map(_.frame_no).distinct.length == fs.length)
    }
  }

  test("BMP decode: known 2x2 payload yields exact channel means and histogram") {
    // pixels (top-down, BGR): blue, green, red, white
    val bgr = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val bmp = Multimodal.encodeBmp(2, 2, bgr)
    val img = Multimodal.decodeBmp(bmp).get
    assert(img.width == 2 && img.height == 2)
    assert(img.bgr.sameElements(bgr), "bottom-up storage must round-trip to top-down pixels")
    val f = Multimodal.imageFeatures(img, 7)
    // each channel lit in 2 of 4 pixels at full intensity ⇒ mean = 0.5
    assert(f(0) == 0.5f && f(1) == 0.5f && f(2) == 0.5f)
    // luma: 85, 85, 85, 255 → buckets (x*4/256): 1,1,1,3 of 4 buckets
    assert(f(3) == 0.0f && f(4) == 0.75f && f(5) == 0.0f && f(6) == 0.25f)
  }

  test("BMP decode: rejects non-BMP, truncated, and non-24bpp payloads") {
    assert(Multimodal.decodeBmp(null).isEmpty)
    assert(Multimodal.decodeBmp("not a bitmap at all, but long enough to pass the length check....".getBytes).isEmpty)
    val ok = Multimodal.encodeBmp(2, 2, new Array[Byte](12))
    assert(Multimodal.decodeBmp(ok).isDefined)
    assert(Multimodal.decodeBmp(ok.take(40)).isEmpty, "truncated header")
    assert(Multimodal.decodeBmp(ok.take(57)).isEmpty, "truncated pixel data")
    val badBpp = ok.clone(); badBpp(28) = 8; assert(Multimodal.decodeBmp(badBpp).isEmpty)
  }

  test("PPM decode: identical pixels through BMP and PPM yield identical features") {
    val bgr = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val ppm = Multimodal.encodePpm(2, 2, bgr)
    val img = Multimodal.decodePpm(ppm).get
    assert(img.width == 2 && img.height == 2)
    assert(img.bgr.sameElements(bgr), "RGB<->BGR swap must round-trip")
    // container invariance: same pixels, same features, either container
    val viaBmp = Multimodal.decode(Multimodal.encodeBmp(2, 2, bgr), 7)
    val viaPpm = Multimodal.decode(ppm, 7)
    assert(viaBmp.sameElements(viaPpm))
  }

  test("PPM decode: header comments/whitespace parse; malformed payloads rejected") {
    val bgr = Array[Byte](10, 20, 30, 40, 50, 60)
    val plain = Multimodal.encodePpm(2, 1, bgr)
    // inject a comment line + odd whitespace into the header
    val commented = ("P6\n# a comment\n 2\t1 #w h\n255\n").getBytes("US-ASCII") ++
      plain.drop("P6\n2 1\n255\n".length)
    val viaComment = Multimodal.decodePpm(commented)
    assert(viaComment.isDefined && viaComment.get.bgr.sameElements(bgr))
    assert(Multimodal.decodePpm(null).isEmpty)
    assert(Multimodal.decodePpm("P3\n2 1\n255\n........".getBytes).isEmpty, "ASCII PPM is not P6")
    assert(Multimodal.decodePpm(plain.dropRight(1)).isEmpty, "short pixel data")
    assert(Multimodal.decodePpm("P6\n2 1\n65535\n............".getBytes).isEmpty, "2-byte maxval")
    // "\r\n" after maxval (Windows writers) is ONE separator — pixels
    // must not shift by a byte
    val crlf = "P6\n2 1\n255\r\n".getBytes("US-ASCII") ++
      plain.drop("P6\n2 1\n255\n".length)
    val viaCrlf = Multimodal.decodePpm(crlf)
    assert(viaCrlf.isDefined && viaCrlf.get.bgr.sameElements(bgr), "CRLF after maxval")
    // a NON-whitespace byte where the separator belongs must reject, not
    // silently shift every pixel read
    val noSep = "P6\n2 1\n255X".getBytes("US-ASCII") ++
      plain.drop("P6\n2 1\n255\n".length)
    assert(Multimodal.decodePpm(noSep).isEmpty, "missing separator after maxval")
  }

  test("WAV decode: known PCM samples yield exact RMS/mean/ZCR features") {
    // hand-built RIFF: fmt (PCM, 1ch, 8kHz, 16-bit) + 4 samples
    val samples = Array[Short](16384, -16384, 16384, -16384)
    val data = new Array[Byte](8)
    samples.indices.foreach { i =>
      data(2 * i) = samples(i).toByte; data(2 * i + 1) = (samples(i) >> 8).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    bos.write("RIFF".getBytes); bos.write(le32(36 + 8)); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); bos.write(le32(16))
    bos.write(le16(1)); bos.write(le16(1)); bos.write(le32(8000)); bos.write(le32(16000))
    bos.write(le16(2)); bos.write(le16(16))
    bos.write("data".getBytes); bos.write(le32(8)); bos.write(data)
    val wav = bos.toByteArray
    val audio = Multimodal.decodeWav(wav).get
    assert(audio.channels == 1 && audio.sampleRate == 8000)
    assert(audio.samples.sameElements(samples))
    val f = Multimodal.audioFeatures(audio, 5)
    assert(f(0) == (16384.0 / 32768.0).toFloat, "RMS of constant |amplitude|")
    assert(f(1) == 0.0f, "mean of symmetric samples")
    assert(f(2) == 1.0f, "every adjacent pair crosses zero")
    // |16384| * 2 / 32768 = bucket 1 of 2 for all samples
    assert(f(3) == 0.0f && f(4) == 1.0f)
    assert(Multimodal.decodeWav("RIFFxxxxJUNK".getBytes ++ new Array[Byte](40)).isEmpty)
  }

  test("container sniffing: BMP and WAV route to real decoders, text to fallback") {
    val bmp = Multimodal.encodeBmp(2, 2, new Array[Byte](12))
    assert(Multimodal.decode(bmp, 7).sameElements(
      Multimodal.imageFeatures(Multimodal.decodeBmp(bmp).get, 7)))
    val text = "just some text".getBytes("UTF-8")
    assert(Multimodal.decode(text, 8).sameElements(Multimodal.decodeStub(text, 8)))
  }

  test("textAsBmp renders documents as decodable images with text as pixels") {
    val media = Multimodal.textAsBmp(Tables(spark, sfDir, "documents")
      .limit(20)).collect()
    assert(media.forall(_.format == "image/bmp"))
    media.foreach { r =>
      val img = Multimodal.decodeBmp(r.payload)
      assert(img.isDefined, s"media ${r.media_id} must decode")
      assert(img.get.width == r.width && img.get.height == r.height)
    }
  }

  test("decode stub is a pure function of bytes") {
    val a = Multimodal.decodeStub("same bytes".getBytes("UTF-8"), 8)
    val b = Multimodal.decodeStub("same bytes".getBytes("UTF-8"), 8)
    val c = Multimodal.decodeStub("diff bytes".getBytes("UTF-8"), 8)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
    assert(Multimodal.decodeStub(null, 8).forall(_ == 0.0f))
  }
}
