package graft.multimodal

import java.nio.charset.StandardCharsets

/**
 * REAL pure-JVM media codecs for the uncompressed container formats —
 * binary PPM (P6) images and RIFF/WAV PCM16 audio. No codec library exists
 * in this container, but these formats are plain byte layouts, so the
 * decode step of the multimodal pipeline is genuinely real for them;
 * only compressed codecs (JPEG/MP3/H.264) remain stubbed.
 */
object Codecs {

  // ------------------------------------------------------------------ PPM (P6)

  final case class PpmImage(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == 3 * width * height,
      s"rgb length ${rgb.length} != 3*$width*$height")
  }

  /** Binary PPM: `P6\n<w> <h>\n255\n` + packed RGB rows. */
  def ppmEncode(img: PpmImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Parse a binary PPM; None for anything malformed (magic, dims, truncation). */
  def ppmDecode(bytes: Array[Byte]): Option[PpmImage] = {
    // header tokens are whitespace-separated: magic, width, height, maxval,
    // then EXACTLY ONE whitespace byte before the pixel data
    var pos = 0
    def token(): Option[String] = {
      while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
      val start = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
      if (pos > start) Some(new String(bytes, start, pos - start, StandardCharsets.US_ASCII))
      else None
    }
    for {
      magic <- token() if magic == "P6"
      w <- token().flatMap(_.toIntOption) if w > 0
      h <- token().flatMap(_.toIntOption) if h > 0
      // Long math: a corrupt header like "100000 100000" would overflow
      // 3*w*h in Int, turning the length check vacuous and crashing the
      // task in PpmImage's require — a decoder must REJECT corrupt input
      px = 3L * w * h if px <= Int.MaxValue
      maxval <- token().flatMap(_.toIntOption) if maxval == 255
      data = bytes.drop(pos + 1) if data.length >= px
    } yield PpmImage(w, h, data.take(px.toInt))
  }

  // ------------------------------------------------------------------ WAV (PCM16)

  final case class WavAudio(sampleRateHz: Int, samples: Array[Short])

  /** Minimal canonical RIFF/WAVE: fmt chunk (PCM, mono, 16-bit LE) + data chunk. */
  def wavEncode(audio: WavAudio): Array[Byte] = {
    val dataLen = audio.samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(audio.sampleRateHz)
      .putInt(audio.sampleRateHz * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    audio.samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse canonical PCM16 mono WAV; None for malformed/compressed/truncated.
   * The whole parse runs under Try: a corrupt fmt-chunk length or a payload
   * truncated mid-field must DROP the record (None), never abort the Spark
   * task with a BufferUnderflow/IllegalArgument from ByteBuffer. */
  def wavDecode(bytes: Array[Byte]): Option[WavAudio] = scala.util.Try[Option[WavAudio]] {
    if (bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); bb.get(a); new String(a, StandardCharsets.US_ASCII)
    }
    if (ascii(4) != "RIFF") return None
    bb.getInt // riff size (ignored; data chunk governs)
    if (ascii(4) != "WAVE" || ascii(4) != "fmt ") return None
    val fmtLen = bb.getInt
    if (fmtLen < 16 || fmtLen > bb.remaining() - 4) return None
    val codec = bb.getShort
    val channels = bb.getShort
    val rate = bb.getInt
    bb.getInt; bb.getShort // byte rate, block align
    val bits = bb.getShort
    bb.position(bb.position() + (fmtLen - 16))
    if (codec != 1 || channels != 1 || bits != 16) return None
    if (ascii(4) != "data") return None
    val dataLen = bb.getInt
    if (dataLen < 0 || dataLen > bb.remaining() || dataLen % 2 != 0) return None
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
    Some(WavAudio(rate, samples))
  }.toOption.flatten
}
