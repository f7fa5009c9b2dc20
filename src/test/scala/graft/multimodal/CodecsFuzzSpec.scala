package graft.multimodal

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Decoder fuzz: on arbitrary and mutated bytes every decoder must return
 * (not throw), and anything it does accept must satisfy its own invariants —
 * the drop-don't-abort posture corrupt media at 100 TB demands. */
class CodecsFuzzSpec extends AnyFunSuite {

  private def invariants(img: Codecs.PpmImage): Unit = {
    assert(img.width > 0 && img.height > 0)
    assert(img.rgb.length == 3 * img.width * img.height)
  }

  test("random byte blobs never throw from any decoder") {
    val rnd = new Random(42)
    for (_ <- 0 until 500) {
      val bytes = Array.fill(rnd.nextInt(300))(rnd.nextInt().toByte)
      Codecs.ppmDecode(bytes).foreach(invariants)
      Codecs.ppmStreamDecode(bytes).foreach(invariants)
      Codecs.wavDecode(bytes).foreach(a => assert(a.samples != null))
      Codecs.imageDecode(bytes).foreach(invariants)
    }
  }

  test("single-byte mutations of valid payloads never throw") {
    val rnd = new Random(7)
    val img = Codecs.PpmImage(5, 4, Array.tabulate(60)(i => (i * 11).toByte))
    val ppm = Codecs.ppmEncode(img)
    val stream = ppm ++ Codecs.ppmEncode(img)
    val wav = Codecs.wavEncode(Codecs.WavAudio(8000,
      Array.tabulate[Short](64)(i => (i * 257).toShort)))
    for (payload <- Seq(ppm, stream, wav); pos <- payload.indices) {
      val mutated = payload.clone()
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      Codecs.ppmDecode(mutated).foreach(invariants)
      Codecs.ppmStreamDecode(mutated).foreach(invariants)
      Codecs.wavDecode(mutated).foreach(a => assert(a.samples != null))
    }
    // truncations at every length of the multi-frame stream
    for (len <- 0 to stream.length) {
      Codecs.ppmStreamDecode(stream.take(len)).foreach(invariants)
    }
  }
}
