package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL pixel-space image hashing with zero external codecs: the JDK
  * ships a full JPEG encoder AND decoder (`javax.imageio`), so the
  * perceptual-hash step of an image dedup pipeline — decode to pixels,
  * pool to a coarse luma grid, difference-hash — runs as a codegen'd
  * Catalyst expression over `binary` payloads (reference stores one
  * profile JPEG per creator, insta_scraper_enhanced.py:395-432; our
  * [[graft.operators.Multimodal.profilePictures]] ingests them).
  *
  * The hash is a 60-BIT dHash (6 rows x 11 cols of mean-luma cells,
  * bit = left cell brighter than its right neighbor, exact integer
  * cross-multiplied means so unequal cell areas never touch floats):
  * 60 bits instead of the classic 64 so the signature rides the same
  * non-negative-long hamming-band machinery as the text SimHash family
  * ([[graft.operators.Dedup.hammingPairsOfSigs]], bits = 60) and the
  * word fits `conv(hex15, 16, 10)` arithmetic on BOTH engines without
  * signed-overflow cases.
  *
  * Oracle strategy (the `mm_wav_meta` move, WavOps.scala): DuckDB
  * cannot decode JPEG, so the hash gate SYNTHESIZES the image from
  * parameters the oracle can independently derive — [[JpegSynth]]
  * builds a block-aligned grayscale JPEG whose cell gradients encode a
  * given 60-bit word with a +/-12 luma margin (every 8x8 cell is one
  * constant JPEG block, so lossy error is DC-quantization only, < 5
  * gray levels at quality >= 80, and can never flip a comparison);
  * [[JpegDHash]] must then recover the word by actually DECODING the
  * pixels. synth -> encode -> decode -> pool -> compare == identity is
  * the hash gate; real photos are gated by MultimodalSpec against an
  * ImageIO reference implementation. */
/** The ONE place graft constructs ImageIO streams (ADVICE r11: two
  * static initializers used to flip the JVM-global
  * `ImageIO.setUseCache` flag as a class-load side effect — a library
  * must not mutate process-wide state, and the perf property silently
  * depended on class-load order). These constructors return
  * MEMORY-cached stream instances DIRECTLY, so the no-temp-file
  * property is structural: the default file-cache mode backs every
  * `ImageIO.createImage{Input,Output}Stream` with a java.nio temp file
  * whose name comes from SecureRandom — measured (jstack, r11 10x
  * sweep): codec tasks spent their time in NativePRNG.implNextBytes +
  * temp-file create/delete, not in the codec (`mm_pixel_neardup`
  * 10.8 s → 0.85 s). Graft's payloads are in-memory byte arrays of a
  * few KB; heap caching is strictly better, and constructing the
  * MemoryCache classes explicitly means no global flag, no class-load
  * ordering, and nothing for a refactor to silently regress
  * (ImageStreamsSpec pins the classes AND greps the codec paths). */
object ImageStreams {
  def input(bytes: Array[Byte]): javax.imageio.stream.ImageInputStream =
    new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
  def output(sink: java.io.OutputStream): javax.imageio.stream.ImageOutputStream =
    new javax.imageio.stream.MemoryCacheImageOutputStream(sink)
}

object ImageUtil {
  val Rows = 6 // cell rows
  val Cols = 11 // cell cols => Rows * (Cols - 1) = 60 comparison bits
  val Cell = 8 // px per cell side == the JPEG DCT block size
  private val Step = 12 // synth luma step per bit; worst walk 128+/-120

  // ThreadLocal codec instances: ImageIO writer/reader construction is
  // a per-call allocation storm (service-registry lookup + plugin
  // instantiation) that dominated GC churn at 450k codec calls in the
  // 10x sweep — executors reuse one instance per thread instead
  // (reset after every use; ImageReader/ImageWriter are single-thread
  // stateful by contract, which ThreadLocal satisfies).
  private val jpegWriterTl: ThreadLocal[javax.imageio.ImageWriter] =
    ThreadLocal.withInitial(() =>
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next())
  private val jpegReaderTl: ThreadLocal[javax.imageio.ImageReader] =
    ThreadLocal.withInitial(() =>
      javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next())

  /** Encode `img` as JPEG at `quality` via the thread-local writer. */
  private def writeJpeg(img: java.awt.image.BufferedImage, quality: Int): Array[Byte] = {
    val writer = jpegWriterTl.get()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(math.max(1, math.min(100, quality)) / 100f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageStreams.output(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      try writer.reset() catch { case _: Exception => () }
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode any ImageIO-readable payload; JPEG magic takes the
    * thread-local reader fast path. Null when undecodable. */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try {
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) {
        val reader = jpegReaderTl.get()
        val iis = ImageStreams.input(bytes)
        try {
          reader.setInput(iis, true, true)
          reader.read(0)
        } finally {
          try reader.reset() catch { case _: Exception => () }
          iis.close()
        }
      } else {
        // ImageIO.read(InputStream) would route through the global
        // file-cache flag; hand it a memory-cached stream instead.
        // ImageIO.read(ImageInputStream) CLOSES the stream itself on a
        // successful read (its documented contract) — an unguarded
        // finally close() then double-closes, throws, and the outer
        // catch turned every successful PNG decode into null.
        val iis = ImageStreams.input(bytes)
        try javax.imageio.ImageIO.read(iis)
        finally { try iis.close() catch { case _: Exception => () } }
      }
    } catch { case _: Exception => null }

  /** Deterministic grayscale JPEG encoding `word`'s 60 bits as
    * adjacent-cell luma gradients (MSB-first, row-major): cell(r,0) =
    * 128; cell(r,c+1) = cell(r,c) - Step when bit (r,c) is 1 (left
    * brighter) else + Step. 88x48 px, every cell exactly one 8x8 JPEG
    * block. `quality` in [1,100] maps to ImageIO's [0.01,1.0]. */
  def synthJpeg(word: Long, quality: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      Cols * Cell, Rows * Cell, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var r = 0
    while (r < Rows) {
      var g = 128
      var c = 0
      while (c < Cols) {
        var y = 0
        while (y < Cell) {
          var x = 0
          while (x < Cell) {
            raster.setSample(c * Cell + x, r * Cell + y, 0, g)
            x += 1
          }
          y += 1
        }
        if (c < Cols - 1) {
          val bit = (word >>> (59 - (r * (Cols - 1) + c))) & 1L
          g = if (bit == 1L) g - Step else g + Step
        }
        c += 1
      }
      r += 1
    }
    writeJpeg(img, quality)
  }

  /** 60-bit dHash of a decodable image payload as 15 lowercase hex
    * chars, or null when ImageIO cannot decode the bytes. Pooling uses
    * exact integer-partition cell boundaries (floor(i*W/Cols)) and the
    * brighter-than comparison cross-multiplies luma SUMS by the other
    * cell's AREA, so nothing floats and unequal edge-cell areas stay
    * exact. Luma is integer BT.601 (299R + 587G + 114B) / 1000. */
  /** Per-cell (luma-sum scaled by 1000, pixel count) pooling over the
    * Rows x Cols grid — the shared feature extractor behind both the
    * difference hash ([[dhashHex]]) and the quantized feature vector
    * ([[gridBuckets]]). Exact integer-partition cell boundaries
    * (floor(i*W/Cols)); integer BT.601 luma. Null when undecodable or
    * smaller than the grid. */
  private def poolCells(bytes: Array[Byte]): (Array[Array[Long]], Array[Array[Long]]) = {
    if (bytes == null || bytes.length < 4) return null
    val img = readImage(bytes)
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    if (w < Cols || h < Rows) return null
    val sums = Array.ofDim[Long](Rows, Cols)
    val cnts = Array.ofDim[Long](Rows, Cols)
    val gray = img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    var y = 0
    while (y < h) {
      val cr = math.min(Rows - 1, y * Rows / h)
      var x = 0
      while (x < w) {
        val cc = math.min(Cols - 1, x * Cols / w)
        val luma =
          if (gray) img.getRaster.getSample(x, y, 0).toLong * 1000L
          else {
            val rgb = img.getRGB(x, y)
            299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
          }
        sums(cr)(cc) += luma
        cnts(cr)(cc) += 1
        x += 1
      }
      y += 1
    }
    (sums, cnts)
  }

  def dhashHex(bytes: Array[Byte]): UTF8String = {
    val pooled = poolCells(bytes)
    if (pooled == null) return null
    val (sums, cnts) = pooled
    var word = 0L
    var r = 0
    while (r < Rows) {
      var c = 0
      while (c < Cols - 1) {
        // mean(r,c) > mean(r,c+1) via exact cross-multiplication
        val left = sums(r)(c) * cnts(r)(c + 1)
        val right = sums(r)(c + 1) * cnts(r)(c)
        if (left > right) word |= 1L << (59 - (r * (Cols - 1) + c))
        c += 1
      }
      r += 1
    }
    UTF8String.fromString(f"$word%015x")
  }

  /** QUANTIZED feature vector: per grid cell, the mean luma's signed
    * distance from the 128 anchor in [[ImageUtil.Step]] units —
    * `round((mean - 128) / Step)`, exact integer round-half-up via
    * floorDiv so negatives round identically on both engines. Over a
    * [[synthJpeg]] payload the bucket of cell (r,c) is EXACTLY the
    * signed prefix sum of the row's gradient steps (each bit moves the
    * luma one full Step = 12, JPEG DC-quantization error < 5 < Step/2
    * can never cross a bucket boundary) — the identity the
    * `mm_pixel_features` oracle replays from the md5 word. Over real
    * photos it is the 66-dim coarse-luma embedding an image dedup /
    * curation pipeline clusters on. Null when undecodable. Row-major:
    * index = r * Cols + c. */
  def gridBuckets(bytes: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val pooled = poolCells(bytes)
    if (pooled == null) return null
    val (sums, cnts) = pooled
    val out = new Array[Int](Rows * Cols)
    var r = 0
    while (r < Rows) {
      var c = 0
      while (c < Cols) {
        // round-half-up((sum/cnt/1000 - 128) / Step) in exact integers:
        // x = luma-sum minus the anchor, d = one Step in sum units
        val x = sums(r)(c) - 128L * 1000L * cnts(r)(c)
        val d = Step.toLong * 1000L * cnts(r)(c)
        out(r * Cols + c) = Math.floorDiv(2L * x + d, 2L * d).toInt
        c += 1
      }
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** REAL pixel resize: decode, bounding-box to `maxSide` preserving
    * aspect ratio with NEAREST-NEIGHBOR sampling, re-encode as JPEG at
    * `quality`. Nearest (not bilinear) is deliberate: an exact integer
    * downscale of constant cells keeps every cell mean bit-identical
    * (sample x' = floor(x*W/w) never crosses a cell boundary), which is
    * what lets the `mm_pixel_resized` oracle gate the WHOLE
    * decode→resize→encode→decode chain as an identity on the synth
    * payloads; on real photos nearest is the standard cheap thumbnail.
    * Payloads already inside the box are still re-encoded (the
    * normalize-to-JPEG contract a thumbnail stage has). Null when the
    * input can't decode. */
  def resizeJpeg(bytes: Array[Byte], maxSide: Int, quality: Int): Array[Byte] = {
    val img = readImage(bytes)
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val m = math.max(w, h)
    val side = math.max(1, maxSide)
    if (m <= side) return writeJpeg(opaque(img), quality)
    // Long arithmetic: w * side overflows Int for large images with a
    // large box (w=h=50000, maxSide=49999 -> negative -> max(1,·) = 1x1).
    val nw = math.max(1, (w.toLong * side / m).toInt)
    val nh = math.max(1, (h.toLong * side / m).toInt)
    val gray = img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    val dst = new java.awt.image.BufferedImage(nw, nh,
      if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < nh) {
      val sy = (y.toLong * h / nh).toInt
      var x = 0
      while (x < nw) {
        val sx = (x.toLong * w / nw).toInt
        if (gray) dst.getRaster.setSample(x, y, 0, img.getRaster.getSample(sx, sy, 0))
        else dst.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    writeJpeg(dst, quality)
  }

  /** JPEG writer needs an opaque raster; repaint onto RGB if needed. */
  private def opaque(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage =
    if (img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR ||
        img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
    else {
      val t = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g2 = t.createGraphics()
      g2.drawImage(img, 0, 0, null)
      g2.dispose()
      t
    }

  /** Re-encode any decodable payload as a JPEG at `quality` — the
    * perturbation a CDN / re-hosting pass applies; pixels survive
    * approximately, bytes don't. Null when the input can't decode. */
  def reencodeJpeg(bytes: Array[Byte], quality: Int): Array[Byte] = {
    val img = readImage(bytes)
    if (img == null) return null
    writeJpeg(opaque(img), quality)
  }
}

/** `jpeg_synth(word bigint, quality int) -> binary`: deterministic
  * grayscale JPEG encoding the word's low 60 bits as cell gradients
  * (see [[ImageUtil.synthJpeg]]). Codegen'd static call. */
case class JpegSynth(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jpeg_synth needs (bigint, int), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(w: Any, q: Any): Any =
    ImageUtil.synthJpeg(w.asInstanceOf[Long], q.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, q) => s"graft.functions.ImageUtil.synthJpeg($w, $q)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JpegSynth =
    copy(left = l, right = r)
  override def prettyName: String = "jpeg_synth"
}

/** `jpeg_dhash(binary) -> string`: 60-bit perceptual difference hash as
  * 15 hex chars via a REAL ImageIO decode ([[ImageUtil.dhashHex]]);
  * null for undecodable payloads (the honest signal — upstream decides
  * whether to quarantine or fall back to byte-space SimHash). */
case class JpegDHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jpeg_dhash needs binary input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    ImageUtil.dhashHex(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the static helper returns null for undecodable payloads, so the
    // generated code re-derives isNull from the call result
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ImageUtil.dhashHex($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): JpegDHash = copy(child = c)
  override def prettyName: String = "jpeg_dhash"
}

/** `jpeg_grid(binary) -> array<int>`: the 66-dim quantized coarse-luma
  * feature vector via a REAL ImageIO decode ([[ImageUtil.gridBuckets]]);
  * null for undecodable payloads. Codegen'd static call. */
case class JpegGrid(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jpeg_grid needs binary input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    ImageUtil.gridBuckets(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the static helper returns null for undecodable payloads, so the
    // generated code re-derives isNull from the call result
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ImageUtil.gridBuckets($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  override protected def withNewChildInternal(c: Expression): JpegGrid = copy(child = c)
  override def prettyName: String = "jpeg_grid"
}

/** `jpeg_resize(binary, maxSide int, quality int) -> binary`: REAL
  * pixel resize — decode, nearest-neighbor bounding-box downscale,
  * re-encode ([[ImageUtil.resizeJpeg]]); null for undecodable
  * payloads. Codegen'd static call. */
case class JpegResize(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == IntegerType &&
      third.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jpeg_resize needs (binary, int, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  override def nullSafeEval(b: Any, s: Any, q: Any): Any =
    ImageUtil.resizeJpeg(b.asInstanceOf[Array[Byte]],
      s.asInstanceOf[Int], q.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, s, q) =>
      s"""
         |${ev.value} = graft.functions.ImageUtil.resizeJpeg($b, $s, $q);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): JpegResize =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "jpeg_resize"
}

object ImageOps {
  import org.apache.spark.sql.GraftColumnBridge
  def jpegSynth(word: Column, quality: Column): Column =
    GraftColumnBridge.column(JpegSynth(
      GraftColumnBridge.expression(word), GraftColumnBridge.expression(quality)))
  def jpegDHash(c: Column): Column =
    GraftColumnBridge.column(JpegDHash(GraftColumnBridge.expression(c)))
  def jpegGrid(c: Column): Column =
    GraftColumnBridge.column(JpegGrid(GraftColumnBridge.expression(c)))
  def jpegResize(c: Column, maxSide: Column, quality: Column): Column =
    GraftColumnBridge.column(JpegResize(GraftColumnBridge.expression(c),
      GraftColumnBridge.expression(maxSide), GraftColumnBridge.expression(quality)))
}
