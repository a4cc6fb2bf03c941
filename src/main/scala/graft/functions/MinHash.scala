package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static helper the generated code calls. */
object MinHashUtil {
  val P = 2147483647L
  /** Affine family constants (a_i, b_i) — shared with the DuckDB oracle. */
  val A: Array[Long] = Array(1103L, 2171L, 3079L, 4397L, 5641L, 6689L, 7919L, 9173L)
  val B: Array[Long] = Array(12345L, 3571L, 8191L, 131L, 524287L, 2053L, 40961L, 75181L)

  private val mdTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** All 8 family minima over base hashes h = first 4 md5 bytes (the
    * same value as `conv(substring(md5(s), 1, 8), 16, 10)`). */
  def sigs(shingles: ArrayData): ArrayData = {
    val md = mdTL.get()
    val mins = new Array[Long](A.length)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(shingles.getUTF8String(i).getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < A.length) {
        val v = (A(j) * h + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Width-parameterized SimHash: base hash = first `bits/4` md5 hex
    * nibbles (the same value as `conv(substring(md5(t), 1, bits/4), 16,
    * 10)`), bit j of the signature is the sign of the ±1 vote sum.
    * Capped at 60 bits so the signature stays POSITIVE in a signed
    * 64-bit integer — the cross-engine portability bound (DuckDB BIGINT
    * has no unsigned 64-bit hex cast); at 60 bits the collision behavior
    * is indistinguishable from 64 for dedup purposes. bits=16 reproduces
    * the original 16-bit signature bit-for-bit. */
  def simhashW(tokens: ArrayData, bits: Int): Long = {
    val md = mdTL.get()
    val votes = new Array[Int](bits)
    val nNibbles = bits / 4
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(tokens.getUTF8String(i).getBytes)
      var h = 0L
      var b = 0
      while (b < nNibbles) {
        val nib = if (b % 2 == 0) (d(b / 2) >> 4) & 0xf else d(b / 2) & 0xf
        h = (h << 4) | nib
        b += 1
      }
      var j = 0
      while (j < bits) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L; var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** 8-family MinHash signature of a shingle array in ONE codegen'd pass —
  * md5 → first-4-bytes base hash → 8 affine minima per element. The
  * SQL-function formulation (`transform(shingles, md5/conv)` + an
  * `aggregate` fold) walks the array through interpreted lambdas and
  * allocates an 8-element array per step; this is a primitive loop.
  * Bit-identical to `least-fold((a_i·conv(substring(md5(s),1,8),16,10)
  * + b_i) % p)`, so the DuckDB oracle is unchanged. */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    MinHashUtil.sigs(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.sigs($c)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** Width-parameterized SimHash over a (pre-deduplicated) token array in
  * one codegen'd pass: token base hash = first `bits/4` md5 hex nibbles,
  * bit j of the signature is the sign of the ±1 vote sum across tokens.
  * Replaces an interpreted fold that allocated a vote array per token.
  * bits=16 is the original signature; bits=60 the wide dedup variant
  * (see [[MinHashUtil.simhashW]] for the 60-bit portability bound). */
case class SimHashSignature(child: Expression, bits: Int = 16) extends UnaryExpression {
  require(bits % 4 == 0 && bits >= 4 && bits <= 60,
    s"simhash bits must be a multiple of 4 in [4, 60], got $bits")
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_sig needs array<string>, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    MinHashUtil.simhashW(v.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.simhashW($c, $bits)")
  override protected def withNewChildInternal(c: Expression): SimHashSignature =
    copy(child = c)
  override def prettyName: String = "simhash_sig"
}

object MinHash {
  import org.apache.spark.sql.GraftColumnBridge
  def minhashSig(c: Column): Column =
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(c)))
  def simhashSig(c: Column, bits: Int = 16): Column =
    GraftColumnBridge.column(SimHashSignature(GraftColumnBridge.expression(c), bits))
}
