package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.Codecs._

/** The REAL codecs: byte-exact round trips, header validation, and the
 * decode pipeline agreeing with an independent recomputation from source. */
class CodecsSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, seed: Int): PpmImage =
    PpmImage(w, h, Array.tabulate(3 * w * h)(i => ((i * 31 + seed) % 256).toByte))

  test("PPM encode/decode round-trips byte-exactly") {
    for ((w, h, s) <- Seq((1, 1, 0), (8, 6, 7), (23, 17, 200), (100, 1, 5))) {
      val original = img(w, h, s)
      val decoded = ppmDecode(ppmEncode(original))
      assert(decoded.isDefined, s"$w x $h")
      assert(decoded.get.width == w && decoded.get.height == h)
      assert(decoded.get.rgb.toSeq == original.rgb.toSeq)
    }
  }

  test("PPM decode rejects malformed payloads") {
    val good = ppmEncode(img(4, 3, 1))
    assert(ppmDecode("P5\n4 3\n255\n".getBytes ++ good.drop(11)).isEmpty, "wrong magic")
    assert(ppmDecode(good.dropRight(1)).isEmpty, "truncated pixel data")
    assert(ppmDecode("P6\n0 3\n255\n".getBytes).isEmpty, "zero width")
    assert(ppmDecode("P6\n4 3\n65535\n".getBytes ++ good.drop(11)).isEmpty, "16-bit maxval")
    assert(ppmDecode(Array.empty[Byte]).isEmpty)
  }

  test("WAV encode/decode round-trips samples and rate exactly") {
    val samples = Array.tabulate(300)(i => ((i * 7919 + 13) % 65536 - 32768).toShort)
    for (rate <- Seq(8000, 16000, 44100)) {
      val decoded = wavDecode(wavEncode(WavAudio(rate, samples)))
      assert(decoded.isDefined)
      assert(decoded.get.sampleRateHz == rate)
      assert(decoded.get.samples.toSeq == samples.toSeq)
    }
    // extremes survive the 16-bit round trip
    val edge = wavDecode(wavEncode(WavAudio(16000, Array(Short.MinValue, Short.MaxValue, 0))))
    assert(edge.get.samples.toSeq == Seq(Short.MinValue, Short.MaxValue, 0.toShort))
  }

  test("WAV decode rejects non-PCM16-mono and truncated payloads") {
    val good = wavEncode(WavAudio(16000, Array.tabulate(10)(_.toShort)))
    assert(wavDecode(good.dropRight(2)).isEmpty, "data shorter than declared")
    val stereo = good.clone
    stereo(22) = 2 // channel count field
    assert(wavDecode(stereo).isEmpty, "stereo")
    val nonPcm = good.clone
    nonPcm(20) = 3 // codec field (IEEE float)
    assert(wavDecode(nonPcm).isEmpty, "non-PCM codec")
    assert(wavDecode(good.take(30)).isEmpty, "truncated header")
  }
}

/** The decode PIPELINE over synthesized real payloads. */
class RealDecodeSpec extends SparkSpec {

  test("PPM resize rescales the actual pixel grid (nearest neighbor)") {
    val spark0 = spark
    import spark0.implicits._
    // 4x2 image with distinct per-pixel colors: pixel (x,y) has R = 10x + y
    val src = Codecs.PpmImage(4, 2,
      (for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3)
        yield (10 * x + y + c).toByte).toArray)
    val media = Seq(MediaRecord(1L, "image", Codecs.ppmEncode(src),
      MediaMeta("ppm", 4, 2, 0))).toDS()
    val out = Multimodal.resizePpm(media, 2, 1).collect().head
    assert(out.meta.width == 2 && out.meta.height == 1)
    val img = Codecs.ppmDecode(out.bytes).get
    assert(img.width == 2 && img.height == 1)
    // nearest neighbor: out(0,0) <- src(0,0), out(1,0) <- src(2,0)
    assert(img.rgb.toSeq == Seq[Byte](0, 1, 2, 20, 21, 22))
    // non-PPM records pass through untouched
    val wav = MediaRecord(2L, "audio",
      Codecs.wavEncode(Codecs.WavAudio(16000, Array(1.toShort))),
      MediaMeta("wav", 0, 0, 16000))
    val passthrough = Multimodal.resizePpm(Seq(wav).toDS(), 2, 1).collect().head
    assert(passthrough.bytes.toSeq == wav.bytes.toSeq)
  }

  test("decodeFeatures equals an independent recomputation from the text bytes") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaPipeline = Multimodal.decodeFeatures(Multimodal.synthesizeReal(docs))
      .collect().map(f => f.doc_id -> f).toMap
    val source = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    var checked = 0
    source.foreach { case (id, text) =>
      val tb = text.getBytes("UTF-8")
      val L = tb.length
      if (L > 0 && id % 3 == 0) {
        val w = L % 16 + 8
        val h = L % 12 + 6
        val f = viaPipeline(id)
        assert(f.modality == "image" && f.n_units == w.toLong * h)
        assert(f.feat_a == (0 until w * h).map(p => (tb((3 * p) % L) & 0xff).toLong).sum)
        checked += 1
      } else if (L > 0 && id % 3 == 1) {
        val f = viaPipeline(id)
        val n = math.min(L, 256)
        assert(f.modality == "audio" && f.n_units == n)
        assert(f.feat_a ==
          (0 until n).map(i => math.abs((tb(i) & 0xff) * 257 - 32768).toLong).sum)
        checked += 1
      }
    }
    assert(checked > 300, s"only $checked docs checked")
    // video docs (and only those) are absent: compressed codecs stay stubbed
    assert(viaPipeline.keySet == source.collect {
      case (id, t) if t.nonEmpty && id % 3 != 2 => id
    }.toSet)
  }
}
