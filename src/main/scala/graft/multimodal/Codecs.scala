package graft.multimodal

import java.nio.charset.StandardCharsets

/**
 * REAL pure-JVM media codecs. Two tiers, no external dependencies:
 *
 *  - hand-rolled byte-layout codecs for binary PPM (P6) images and RIFF/WAV
 *    PCM16 audio — plain byte layouts, fully oracle-able (the q47 gate
 *    recomputes every decoded pixel/sample in SQL);
 *  - the JDK's own `javax.imageio.ImageIO` (java.desktop ships with the JRE)
 *    for COMPRESSED images — PNG, JPEG, BMP, GIF decode with zero new
 *    dependencies via [[imageIoDecode]], normalized into the same
 *    [[PpmImage]] shape the PPM path uses.
 *
 * Only compressed AUDIO/VIDEO codecs (MP3/H.264) remain stubbed — the JDK
 * ships no decoder for those.
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

  /** Parse one binary PPM frame starting at `start`; returns the image and
   * the offset of the first byte AFTER its pixel data (where the next frame
   * of a concatenated stream begins). None for anything malformed. */
  private def ppmParseAt(bytes: Array[Byte], start: Int): Option[(PpmImage, Int)] = {
    // header tokens are whitespace-separated: magic, width, height, maxval,
    // then EXACTLY ONE whitespace byte before the pixel data
    var pos = start
    def token(): Option[String] = {
      while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
      val tokenStart = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
      if (pos > tokenStart)
        Some(new String(bytes, tokenStart, pos - tokenStart, StandardCharsets.US_ASCII))
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
      dataStart = pos + 1 if bytes.length - dataStart >= px
    } yield (PpmImage(w, h,
      java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + px.toInt)),
      dataStart + px.toInt)
  }

  /** Parse a binary PPM; None for anything malformed (magic, dims, truncation).
   * Trailing bytes after the pixel data are tolerated (historical behavior). */
  def ppmDecode(bytes: Array[Byte]): Option[PpmImage] =
    ppmParseAt(bytes, 0).map(_._1)

  /** Parse a CONCATENATED-PPM video stream (the `ffmpeg -f image2pipe -vcodec
   * ppm` raw-video shape): consecutive P6 frames back to back. Parsing stops
   * at the first malformed/truncated frame — complete frames before the
   * corruption survive, the drop-don't-abort posture for corrupt media. */
  def ppmStreamDecode(bytes: Array[Byte]): Vector[PpmImage] = {
    val out = Vector.newBuilder[PpmImage]
    var pos = 0
    var more = pos < bytes.length
    while (more) {
      ppmParseAt(bytes, pos) match {
        case Some((img, next)) =>
          out += img
          pos = next
          more = pos < bytes.length
        case None => more = false
      }
    }
    out.result()
  }

  // ------------------------------------------- compressed images (JDK ImageIO)

  /** PNG-encode via the JDK's built-in ImageIO writer — lossless, so a
   * [[pngEncode]] → [[imageIoDecode]] round trip is pixel-exact (pinned in
   * CodecsSpec). */
  def pngEncode(img: PpmImage): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val o = 3 * (y * img.width + x)
        bi.setRGB(x, y,
          ((img.rgb(o) & 0xff) << 16) | ((img.rgb(o + 1) & 0xff) << 8) | (img.rgb(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  /** Decode any JDK-supported compressed image (PNG/JPEG/BMP/GIF) into the
   * shared [[PpmImage]] shape; None for undecodable bytes. `ImageIO.read`
   * returns null (no registered reader) for non-image payloads and throws on
   * truncated streams — both become None, the corrupt-media drop posture. */
  def imageIoDecode(bytes: Array[Byte]): Option[PpmImage] = scala.util.Try {
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { bi =>
      val w = bi.getWidth
      val h = bi.getHeight
      val rgb = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = bi.getRGB(x, y) // sRGB regardless of the source color model
          val o = 3 * (y * w + x)
          rgb(o) = ((p >> 16) & 0xff).toByte
          rgb(o + 1) = ((p >> 8) & 0xff).toByte
          rgb(o + 2) = (p & 0xff).toByte
          x += 1
        }
        y += 1
      }
      PpmImage(w, h, rgb)
    }
  }.toOption.flatten

  /** Format-sniffing image decode: PPM first (ImageIO has no PPM reader),
   * then the ImageIO formats — one entry point for every image payload. */
  def imageDecode(bytes: Array[Byte]): Option[PpmImage] =
    ppmDecode(bytes).orElse(imageIoDecode(bytes))

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
