package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level cases for the RIFF/WAV walker: hand-assembled containers
  * (LE fields written explicitly) so the parser is proven against the
  * spec, not against the query's own synthesizer. */
class WavOpsSpec extends AnyFunSuite {

  private def le2(x: Int): Array[Byte] =
    Array((x & 0xFF).toByte, ((x >> 8) & 0xFF).toByte)
  private def le4(x: Long): Array[Byte] =
    Array((x & 0xFF).toByte, ((x >> 8) & 0xFF).toByte,
      ((x >> 16) & 0xFF).toByte, ((x >> 24) & 0xFF).toByte)
  private def tag(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def fmtChunk(ch: Int, sr: Long, bits: Int): Array[Byte] = {
    val ba = ch * bits / 8
    tag("fmt ") ++ le4(16) ++ le2(1) ++ le2(ch) ++ le4(sr) ++
      le4(sr * ba) ++ le2(ba) ++ le2(bits)
  }
  private def riff(chunks: Array[Byte]): Array[Byte] =
    tag("RIFF") ++ le4(4L + chunks.length) ++ tag("WAVE") ++ chunks

  private def unpack(p: Long) =
    (p >> 44, (p >> 40) & 15, (p >> 32) & 255, p & 0xFFFFFFFFL)

  test("canonical 16-bit stereo 44100 Hz container") {
    val data = new Array[Byte](44100 * 4) // exactly 1 s at 44.1k stereo
    val wav = riff(fmtChunk(2, 44100L, 16) ++ tag("data") ++
      le4(data.length.toLong) ++ data)
    val (sr, ch, bits, ms) = unpack(WavUtil.metaPacked(wav))
    assert((sr, ch, bits, ms) === (44100L, 2L, 16L, 1000L))
  }

  test("unknown chunks are skipped and odd sizes pad to even offsets") {
    // LIST chunk of ODD size 3 before fmt: walker must skip 8+3+1 bytes
    val junk = tag("LIST") ++ le4(3) ++ Array[Byte](1, 2, 3) ++ Array[Byte](0)
    val data = Array[Byte](9, 9, 9, 9, 9, 9, 9, 9)
    val wav = riff(junk ++ fmtChunk(1, 8000L, 8) ++ tag("data") ++
      le4(data.length.toLong) ++ data)
    val (sr, ch, bits, ms) = unpack(WavUtil.metaPacked(wav))
    // 8 bytes at 8000 B/s mono 8-bit -> 1 ms
    assert((sr, ch, bits, ms) === (8000L, 1L, 8L, 1L))
  }

  test("non-RIFF, truncated, and size-overflow payloads parse to -1") {
    assert(WavUtil.metaPacked("not audio at all".getBytes) === -1L)
    assert(WavUtil.metaPacked(null) === -1L)
    val ok = riff(fmtChunk(1, 8000L, 8) ++ tag("data") ++ le4(4) ++
      Array[Byte](1, 2, 3, 4))
    assert(WavUtil.metaPacked(ok) !== -1L)
    assert(WavUtil.metaPacked(ok.dropRight(3)) === -1L) // data chunk lies
    // declared fmt size runs past the buffer
    val lying = riff(tag("fmt ") ++ le4(4096) ++ new Array[Byte](8))
    assert(WavUtil.metaPacked(lying) === -1L)
  }

  test("sample-rate packing boundary: 2^19-1 packs non-negative, 2^19 rejects") {
    def wavAt(sr: Long): Array[Byte] =
      riff(fmtChunk(1, sr, 8) ++ tag("data") ++ le4(4) ++ Array[Byte](1, 2, 3, 4))
    // max admissible rate: packed value stays non-negative (ADVICE r10 —
    // a rate in [2^19, 2^20) would set the sign bit through the <<44)
    val maxOk = WavUtil.metaPacked(wavAt((1L << 19) - 1))
    assert(maxOk >= 0L)
    assert(unpack(maxOk)._1 === (1L << 19) - 1)
    assert(WavUtil.metaPacked(wavAt(1L << 19)) === -1L)
    assert(WavUtil.metaPacked(wavAt((1L << 20) - 1)) === -1L)
  }

  test("expression matches the static walker through codegen") {
    val spark = graft.Sessions.local("2", "graft-wav-test")
    import spark.implicits._
    val wav = riff(fmtChunk(2, 16000L, 16) ++ tag("data") ++ le4(64000L) ++
      new Array[Byte](64000))
    val df = Seq((1L, wav), (2L, "junk".getBytes)).toDF("id", "payload")
    val got = df.select($"id", WavMeta.wavMeta($"payload").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) === WavUtil.metaPacked(wav))
    assert(unpack(got(1L)) === ((16000L, 2L, 16L, 1000L)))
    assert(got(2L) === -1L)
  }
}
