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

  test("decode stub is a pure function of bytes") {
    val a = Multimodal.decodeStub("same bytes".getBytes("UTF-8"), 8)
    val b = Multimodal.decodeStub("same bytes".getBytes("UTF-8"), 8)
    val c = Multimodal.decodeStub("diff bytes".getBytes("UTF-8"), 8)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
    assert(Multimodal.decodeStub(null, 8).forall(_ == 0.0f))
  }
}
