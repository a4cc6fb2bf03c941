package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Static JPEG header walker the generated code calls (same pattern as
  * [[PyRoundUtil]]: object ⇒ static forwarders, so codegen references a
  * plain Java static and the expression stays in whole-stage codegen).
  *
  * No codec involved: JFIF dimensions live in the SOF segment header
  * (ITU T.81 §B.2.2), so parsing is pure byte-walking — marker = 0xFF
  * + code, then a big-endian 16-bit length that includes itself. The
  * reference stores one such JPEG per creator
  * (insta_scraper_enhanced.py:395-432).
  */
object JpegUtil {
  /** (width << 32) | height of the first SOF segment, or -1 when the
    * payload is not a parseable JPEG. SOF codes are 0xC0..0xCF minus
    * DHT(0xC4), JPG(0xC8), DAC(0xCC). */
  def dimsPacked(b: Array[Byte]): Long = {
    if (b == null || b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return -1L
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return -1L // lost marker sync
      val m = b(i + 1) & 0xFF
      if (m == 0xFF) { // fill byte before a marker
        i += 1
      } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { // TEM/RSTn: no payload
        i += 2
      } else if (m == 0xD9 || m == 0xDA) { // EOI / SOS before any SOF
        return -1L
      } else {
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (len < 2) return -1L
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          // SOF payload: length(2) precision(1) height(2) width(2) ...
          // len < 8 means the declared segment cannot hold the dims —
          // reading on would take bytes from the NEXT segment as w/h
          if (len < 8 || i + 8 >= b.length) return -1L
          val h = ((b(i + 5) & 0xFF) << 8) | (b(i + 6) & 0xFF)
          val w = ((b(i + 7) & 0xFF) << 8) | (b(i + 8) & 0xFF)
          return (w.toLong << 32) | h.toLong
        }
        i += 2 + len
      }
    }
    -1L
  }
}

/** `jpeg_dims(binary) -> bigint`: packed (width<<32)|height from the SOF
  * header, -1 if not a parseable JPEG. Codegen'd static call — one byte
  * walk per row, no decode, no UDF serialization. */
case class JpegDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jpeg_dims needs binary input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    JpegUtil.dimsPacked(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JpegUtil.dimsPacked($c)")
  override protected def withNewChildInternal(c: Expression): JpegDims = copy(child = c)
  override def prettyName: String = "jpeg_dims"
}

object JpegDims {
  import org.apache.spark.sql.GraftColumnBridge
  def jpegDims(c: Column): Column =
    GraftColumnBridge.column(JpegDims(GraftColumnBridge.expression(c)))
}
