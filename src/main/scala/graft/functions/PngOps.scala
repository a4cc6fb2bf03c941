package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Static PNG chunk walker — the lossless-image sibling of [[WavUtil]]
  * (RIFF/WAV) and [[JpegUtil]] (JPEG SOF): same static-forwarder
  * pattern so codegen calls a plain Java static and the expression
  * stays inside whole-stage codegen.
  *
  * No codec involved for METADATA: a PNG's display parameters live
  * entirely in the IHDR chunk (PNG 1.2 spec §4.1.1, first chunk by
  * requirement): big-endian u32 width + u32 height + u8 bit depth +
  * u8 colour type. The walker still traverses the full chunk list
  * (length-BE u32, 4-byte type, payload, CRC) so truncated or lying
  * containers are detected — the robustness contract WavOpsSpec pins
  * for the audio walker — and it totals the IDAT payload bytes, the
  * number a storage auditor wants without inflating a single pixel.
  */
object PngUtil {
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0).toByte && b(i + 1) == t.charAt(1).toByte &&
      b(i + 2) == t.charAt(2).toByte && b(i + 3) == t.charAt(3).toByte

  /** Packed (width << 40) | (height << 16) | (bitDepth << 8) |
    * colourType, or -1 when the payload is not a well-formed PNG
    * (bad signature, IHDR not first / wrong size, a chunk running past
    * the buffer, no IDAT, or no IEND close). Width is capped at 2^23-1
    * and height at 2^24-1 so the packed value can never set the sign
    * bit or collide with the -1 sentinel (the WavUtil rate-guard
    * lesson, ADVICE r10). */
  def metaPacked(b: Array[Byte]): Long = {
    if (b == null || b.length < 33) return -1L
    // 8-byte signature: \x89PNG\r\n\x1a\n
    if ((b(0) & 0xFF) != 0x89 || b(1) != 'P'.toByte || b(2) != 'N'.toByte ||
      b(3) != 'G'.toByte ||
      b(4) != 0x0D || b(5) != 0x0A || b(6) != 0x1A || b(7) != 0x0A) return -1L
    // IHDR must be the first chunk, length exactly 13
    if (u32be(b, 8) != 13L || !tag(b, 12, "IHDR")) return -1L
    val width = u32be(b, 16)
    val height = u32be(b, 20)
    val depth = b(24) & 0xFF
    val colour = b(25) & 0xFF
    if (width <= 0 || height <= 0 ||
      width >= (1L << 23) || height >= (1L << 24)) return -1L
    // walk the full chunk list: every length must fit the buffer, IDAT
    // must appear, IEND must close the stream
    var i = 8
    var idatBytes = -1L
    var ended = false
    while (!ended && i + 12 <= b.length) {
      val size = u32be(b, i)
      if (i + 12 + size > b.length) return -1L // lying/truncated chunk
      if (tag(b, i + 4, "IDAT"))
        idatBytes = (if (idatBytes < 0) 0L else idatBytes) + size
      else if (tag(b, i + 4, "IEND")) ended = true
      i += 12 + size.toInt
    }
    if (!ended || idatBytes < 0) return -1L
    (width << 40) | (height << 16) | (depth.toLong << 8) | colour.toLong
  }

  /** Total IDAT (compressed pixel stream) bytes, or -1 when not a
    * well-formed PNG — the compression-ratio numerator a lake auditor
    * reports per payload.
    *
    * The walk MIRRORS [[metaPacked]]'s exactly — stop at IEND, bounds
    * guard before every `size.toInt` (ADVICE r11): metaPacked only
    * validated chunks UP TO IEND, and PNGs with trailing bytes after
    * IEND are both spec-legal and common in the wild, so an unguarded
    * re-walk past IEND reads unvalidated lengths (a trailing u32 of
    * 0xFFFFFFF4 makes `12 + size.toInt` == 0 — an infinite loop). */
  def idatBytes(b: Array[Byte]): Long = {
    if (metaPacked(b) < 0) return -1L
    var i = 8
    var idat = 0L
    var ended = false
    while (!ended && i + 12 <= b.length) {
      val size = u32be(b, i)
      if (i + 12 + size > b.length) return -1L // unreachable pre-IEND (metaPacked passed); guards drift
      if (tag(b, i + 4, "IDAT")) idat += size
      else if (tag(b, i + 4, "IEND")) ended = true
      i += 12 + size.toInt
    }
    idat
  }

  /** Deterministic REAL grayscale PNG (JDK ImageIO writer): `width` x
    * `height`, pixel(x, y) = (x + y) mod 256 — content is irrelevant to
    * the metadata walker but makes payload sizes realistic. The JDK PNG
    * writer emits 8-bit grayscale (colour type 0) for TYPE_BYTE_GRAY
    * rasters, which the synth→parse round-trip gate pins. */
  def synthPng(width: Int, height: Int): Array[Byte] = {
    val w = math.max(1, math.min(width, 4096))
    val h = math.max(1, math.min(height, 4096))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, (x + y) & 0xFF)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // explicit memory-cached stream ([[ImageStreams]]): the
    // OutputStream overload would consult the JVM-global cache flag
    // and pay a SecureRandom-named temp file per encode
    val ios = ImageStreams.output(bos)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    bos.toByteArray
  }
}

/** `png_meta(binary) -> bigint`: packed (width<<40)|(height<<16)|
  * (depth<<8)|colour from the IHDR chunk after a full chunk-list walk,
  * -1 if not a well-formed PNG. Codegen'd static call — one byte walk
  * per row, no decode, no UDF. */
case class PngMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"png_meta needs binary input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    PngUtil.metaPacked(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PngUtil.metaPacked($c)")
  override protected def withNewChildInternal(c: Expression): PngMeta = copy(child = c)
  override def prettyName: String = "png_meta"
}

/** `png_synth(width int, height int) -> binary`: a real grayscale PNG
  * written by the JDK's ImageIO — the synthesis half of the
  * synth→parse round-trip gate (the `mm_wav_meta` oracle move). */
case class PngSynth(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"png_synth needs (int, int), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(w: Any, h: Any): Any =
    PngUtil.synthPng(w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, h) => s"graft.functions.PngUtil.synthPng($w, $h)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PngSynth =
    copy(left = l, right = r)
  override def prettyName: String = "png_synth"
}

object PngOps {
  import org.apache.spark.sql.GraftColumnBridge
  def pngMeta(c: Column): Column =
    GraftColumnBridge.column(PngMeta(GraftColumnBridge.expression(c)))
  def pngSynth(w: Column, h: Column): Column =
    GraftColumnBridge.column(PngSynth(
      GraftColumnBridge.expression(w), GraftColumnBridge.expression(h)))
}
