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

  test("decode stub is a pure function of bytes") {
    val a = Multimodal.decodeStub("same bytes".getBytes("UTF-8"), 8)
    val b = Multimodal.decodeStub("same bytes".getBytes("UTF-8"), 8)
    val c = Multimodal.decodeStub("diff bytes".getBytes("UTF-8"), 8)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
    assert(Multimodal.decodeStub(null, 8).forall(_ == 0.0f))
  }
}
