package graft.multimodal

import graft.SparkSpec
import graft.queries.Tables

/** Multimodal plumbing: schema, batch shape, deterministic stub transforms. */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("synthesize → extractFeatures roundtrip: counts, digests, checksums") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.synthesize(docs)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == docs.count())
    val byId = feats.map(f => f.doc_id -> f).toMap
    val sample = docs.select("doc_id", "text").collect().take(10)
    sample.foreach { r =>
      val id = r.getLong(0); val text = r.getString(1)
      val bytes = text.getBytes("UTF-8")
      val f = byId(id)
      assert(f.n_bytes == bytes.length)
      assert(f.head_checksum == bytes.take(16).map(_ & 0xff).sum)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      assert(f.content_md5 == md5)
    }
  }

  test("resizeStub shrinks payload and metadata consistently") {
    val media = Multimodal.synthesize(Tables.documents(spark, sf))
    val before = media.collect().map(r => r.doc_id -> r).toMap
    val after = Multimodal.resizeStub(media, 4).collect()
    after.foreach { r =>
      val b = before(r.doc_id)
      assert(r.bytes.length == (b.bytes.length + 3) / 4)
      assert(r.meta.width == math.max(1, b.meta.width / 4))
    }
  }

  test("frameSampleStub emits nFrames rows per video record") {
    val media = Multimodal.synthesize(Tables.documents(spark, sf))
    val nVideos = media.filter(_.modality == "video").count()
    val frames = Multimodal.frameSampleStub(media, nFrames = 3, frameBytes = 32)
    assert(frames.count() == nVideos * 3)
    assert(frames.columns.toSeq ==
      Seq("doc_id", "frame", "frame_len", "frame_bytes"))
  }
}
