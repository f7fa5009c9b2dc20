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

  test("ppmStreamDecode: multi-frame round trip, truncation drops the tail only") {
    def img(seed: Int) = Codecs.PpmImage(4, 3,
      Array.tabulate(36)(i => ((i * 7 + seed) % 251).toByte))
    val frames = Seq(img(1), img(2), img(3))
    val stream = frames.map(Codecs.ppmEncode).reduce(_ ++ _)
    val decoded = Codecs.ppmStreamDecode(stream)
    assert(decoded.length == 3)
    decoded.zip(frames).foreach { case (d, o) =>
      assert(d.width == o.width && d.height == o.height && d.rgb.sameElements(o.rgb))
    }
    // truncated mid-third-frame: the two complete frames survive
    val cut = Codecs.ppmStreamDecode(stream.dropRight(10))
    assert(cut.length == 2)
    // whitespace between frames is legal NetPBM — the parser skips it
    val spaced = Codecs.ppmEncode(img(1)) ++ Array[Byte](' ', '\n') ++
      Codecs.ppmEncode(img(2))
    assert(Codecs.ppmStreamDecode(spaced).length == 2)
    // non-whitespace garbage stops the parse (no resync — corrupt stream)
    val garbage = Codecs.ppmEncode(img(1)) ++ "XXX".getBytes ++
      Codecs.ppmEncode(img(2))
    assert(Codecs.ppmStreamDecode(garbage).length == 1)
    assert(Codecs.ppmStreamDecode(Array.emptyByteArray).isEmpty)
  }

  test("frameSample parses the real container and keeps every k-th frame") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.synthesizeVideoReal(docs)
    val byId = media.collect().map(r => r.doc_id -> r).toMap
    assert(byId.nonEmpty)
    val sampled = Multimodal.frameSample(media, every = 2).collect()
      .groupBy(_.getLong(0))
    byId.foreach { case (id, r) =>
      val frames = Codecs.ppmStreamDecode(r.bytes)
      assert(frames.length >= 2) // container really holds L%4+2 frames
      val rows = sampled(id).sortBy(_.getInt(1))
      assert(rows.map(_.getInt(1)).toSeq == (0 until frames.length by 2).toSeq)
      rows.foreach { row =>
        val img = frames(row.getInt(1))
        assert(row.getInt(2) == img.width && row.getInt(3) == img.height)
        assert(row.getLong(4) == img.rgb.map(_ & 0xff).map(_.toLong).sum)
      }
    }
  }

}
