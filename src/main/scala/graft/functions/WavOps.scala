package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Static RIFF/WAV header walker — the AUDIO sibling of [[JpegUtil]]
  * (same object ⇒ static-forwarder pattern so codegen calls a plain
  * Java static and the expression stays in whole-stage codegen).
  *
  * No codec involved: a WAV file's playback metadata lives entirely in
  * the `fmt ` chunk (RIFF 1991 spec / MS WAVEFORMATEX): little-endian
  * u16 channels + u32 sample rate + u32 byte rate + u16 block align +
  * u16 bits per sample; the payload size is the `data` chunk length.
  * Parsing is pure byte-walking over the chunk list (ids are 4 ASCII
  * bytes, sizes u32 LE, chunks pad to even offsets).
  */
object WavUtil {
  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0).toByte && b(i + 1) == t.charAt(1).toByte &&
      b(i + 2) == t.charAt(2).toByte && b(i + 3) == t.charAt(3).toByte

  /** Packed (sampleRate << 44) | (channels << 40) | (bits << 32) |
    * durationMs, or -1 when the payload is not a parseable PCM WAV.
    * durationMs = dataBytes·1000 / byteRate (floor) — the fields a
    * curation pipeline filters on (rate/channel/length ladders) without
    * ever decoding samples. */
  def metaPacked(b: Array[Byte]): Long = {
    if (b == null || b.length < 44) return -1L
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return -1L
    var sampleRate = -1L; var channels = -1; var bits = -1; var byteRate = -1L
    var dataBytes = -1L
    var i = 12
    while (i + 8 <= b.length && (sampleRate < 0 || dataBytes < 0)) {
      val size = u32(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return -1L
      if (tag(b, i, "fmt ")) {
        if (size < 16) return -1L
        channels = u16(b, i + 10)
        sampleRate = u32(b, i + 12)
        byteRate = u32(b, i + 16)
        bits = u16(b, i + 22)
      } else if (tag(b, i, "data")) {
        dataBytes = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    if (sampleRate <= 0 || channels <= 0 || bits <= 0 || byteRate <= 0 ||
      dataBytes < 0) return -1L
    // rate bound is 2^19, not the 2^20 the 20-bit field could hold:
    // packing shifts by 44, so a rate in [2^19, 2^20) would set the
    // sign bit — arithmetic shiftright consumers would read a negative
    // rate, and the all-ones combination collides with the -1 sentinel
    // (ADVICE r10). 2^19-1 = 524287 Hz still covers every real rate
    // (384 kHz studio masters included).
    if (sampleRate >= (1L << 19) || channels >= 16 || bits >= 256) return -1L
    val durMs = dataBytes * 1000L / byteRate
    if (durMs >= (1L << 32)) return -1L
    (sampleRate << 44) | (channels.toLong << 40) | (bits.toLong << 32) | durMs
  }
}

/** `wav_meta(binary) -> bigint`: packed (rate<<44)|(ch<<40)|(bits<<32)|
  * duration_ms from the RIFF header, -1 if not a parseable WAV.
  * Codegen'd static call — one byte walk per row, no decode, no UDF. */
case class WavMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"wav_meta needs binary input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    WavUtil.metaPacked(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavUtil.metaPacked($c)")
  override protected def withNewChildInternal(c: Expression): WavMeta = copy(child = c)
  override def prettyName: String = "wav_meta"
}

object WavMeta {
  import org.apache.spark.sql.GraftColumnBridge
  def wavMeta(c: Column): Column =
    GraftColumnBridge.column(WavMeta(GraftColumnBridge.expression(c)))
}
