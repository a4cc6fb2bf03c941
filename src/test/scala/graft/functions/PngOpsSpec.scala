package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level cases for the PNG chunk walker: hand-assembled containers
  * (BE fields written explicitly) so the parser is proven against the
  * PNG 1.2 spec, not against the query's own ImageIO synthesizer — plus
  * the ImageIO round-trip the `mm_media_router` oracle relies on. */
class PngOpsSpec extends AnyFunSuite {

  private def be4(x: Long): Array[Byte] =
    Array(((x >> 24) & 0xFF).toByte, ((x >> 16) & 0xFF).toByte,
      ((x >> 8) & 0xFF).toByte, (x & 0xFF).toByte)
  private def tag(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  /** chunk = length + type + payload + 4-byte CRC (zeroed; the walker
    * skips CRCs). */
  private def chunk(t: String, payload: Array[Byte]): Array[Byte] =
    be4(payload.length.toLong) ++ tag(t) ++ payload ++ Array[Byte](0, 0, 0, 0)
  private def ihdr(w: Long, h: Long, depth: Int, colour: Int): Array[Byte] =
    chunk("IHDR", be4(w) ++ be4(h) ++
      Array(depth.toByte, colour.toByte, 0.toByte, 0.toByte, 0.toByte))

  private def unpack(p: Long) =
    (p >> 40, (p >> 16) & 0xFFFFFF, (p >> 8) & 255, p & 255)

  test("hand-assembled container: IHDR fields recovered, chunks walked") {
    val png = sig ++ ihdr(640, 480, 8, 2) ++
      chunk("IDAT", Array[Byte](1, 2, 3, 4, 5)) ++
      chunk("IEND", Array.empty)
    assert(unpack(PngUtil.metaPacked(png)) === ((640L, 480L, 8L, 2L)))
    assert(PngUtil.idatBytes(png) === 5L)
  }

  test("multiple IDAT chunks total; foreign chunks are skipped") {
    val png = sig ++ ihdr(3, 2, 8, 0) ++
      chunk("tEXt", "comment".getBytes) ++
      chunk("IDAT", Array[Byte](1, 2, 3)) ++
      chunk("IDAT", Array[Byte](4, 5)) ++
      chunk("IEND", Array.empty)
    assert(unpack(PngUtil.metaPacked(png)) === ((3L, 2L, 8L, 0L)))
    assert(PngUtil.idatBytes(png) === 5L)
  }

  test("malformed containers parse to -1") {
    assert(PngUtil.metaPacked(null) === -1L)
    assert(PngUtil.metaPacked("not an image".getBytes) === -1L)
    // bad signature byte
    val good = sig ++ ihdr(4, 4, 8, 0) ++
      chunk("IDAT", Array[Byte](1)) ++ chunk("IEND", Array.empty)
    assert(PngUtil.metaPacked(good) >= 0)
    val badSig = good.clone(); badSig(1) = 'Q'.toByte
    assert(PngUtil.metaPacked(badSig) === -1L)
    // IHDR not first
    val notFirst = sig ++ chunk("tEXt", "x".getBytes) ++ ihdr(4, 4, 8, 0) ++
      chunk("IDAT", Array[Byte](1)) ++ chunk("IEND", Array.empty)
    assert(PngUtil.metaPacked(notFirst) === -1L)
    // lying chunk size runs past the buffer
    val lying = sig ++ ihdr(4, 4, 8, 0) ++
      (be4(1000L) ++ tag("IDAT") ++ Array[Byte](1, 2)) // no room for 1000
    assert(PngUtil.metaPacked(lying) === -1L)
    // truncated: no IEND
    val noEnd = sig ++ ihdr(4, 4, 8, 0) ++ chunk("IDAT", Array[Byte](1))
    assert(PngUtil.metaPacked(noEnd) === -1L)
    // no IDAT at all
    val noDat = sig ++ ihdr(4, 4, 8, 0) ++ chunk("IEND", Array.empty)
    assert(PngUtil.metaPacked(noDat) === -1L)
  }

  test("dimension guard: packed value never sets the sign bit") {
    // width at the 2^23 cap and height at the 2^24 cap are rejected
    val wide = sig ++ ihdr(1L << 23, 4, 8, 0) ++
      chunk("IDAT", Array[Byte](1)) ++ chunk("IEND", Array.empty)
    assert(PngUtil.metaPacked(wide) === -1L)
    val tall = sig ++ ihdr(4, 1L << 24, 8, 0) ++
      chunk("IDAT", Array[Byte](1)) ++ chunk("IEND", Array.empty)
    assert(PngUtil.metaPacked(tall) === -1L)
    // the maximal admissible combination stays non-negative and distinct
    // from the -1 sentinel
    val maxed = sig ++ ihdr((1L << 23) - 1, (1L << 24) - 1, 255, 255) ++
      chunk("IDAT", Array[Byte](1)) ++ chunk("IEND", Array.empty)
    val p = PngUtil.metaPacked(maxed)
    assert(p > 0)
    assert(unpack(p) === (((1L << 23) - 1, (1L << 24) - 1, 255L, 255L)))
  }

  test("ImageIO round-trip: synthesized PNG parses back to its params") {
    for ((w, h) <- Seq((16, 16), (115, 37), (1, 1), (640, 480))) {
      val bytes = PngUtil.synthPng(w, h)
      val (pw, ph, depth, colour) = unpack(PngUtil.metaPacked(bytes))
      assert((pw, ph) === ((w.toLong, h.toLong)), s"dims for ${w}x$h")
      // the JDK PNG writer emits 8-bit grayscale for TYPE_BYTE_GRAY
      assert((depth, colour) === ((8L, 0L)))
      assert(PngUtil.idatBytes(bytes) > 0)
      // and an independent decoder agrees
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert((img.getWidth, img.getHeight) === ((w, h)))
    }
  }

  test("cross-walker isolation: JPEG and WAV payloads are not PNGs") {
    assert(PngUtil.metaPacked(ImageUtil.synthJpeg(0x123456789abcdL, 90)) === -1L)
    assert(JpegUtil.dimsPacked(PngUtil.synthPng(32, 32)) === -1L)
    assert(WavUtil.metaPacked(PngUtil.synthPng(32, 32)) === -1L)
  }
}
