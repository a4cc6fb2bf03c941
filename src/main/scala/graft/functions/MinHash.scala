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

  /** 16-bit SimHash: base hash = first 2 md5 bytes (as
    * `conv(substring(md5(t), 1, 4), 16, 10)`), sign-of-vote-sum bits. */
  def simhash16(tokens: ArrayData): Long = {
    val md = mdTL.get()
    val votes = new Array[Int](16)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(tokens.getUTF8String(i).getBytes)
      val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var j = 0
      while (j < 16) {
        votes(j) += (if (((h >> j) & 1) == 1) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L; var j = 0
    while (j < 16) {
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

/** 16-bit SimHash over a (pre-deduplicated) token array in one codegen'd
  * pass: token base hash = first 2 md5 bytes (the same value as
  * `conv(substring(md5(t), 1, 4), 16, 10)`), bit j of the signature is
  * the sign of the ±1 vote sum across tokens. Replaces an interpreted
  * fold that allocated a 16-element vote array per token. */
case class SimHashSignature(child: Expression) extends UnaryExpression {
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
    MinHashUtil.simhash16(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.simhash16($c)")
  override protected def withNewChildInternal(c: Expression): SimHashSignature =
    copy(child = c)
  override def prettyName: String = "simhash_sig"
}

object MinHash {
  import org.apache.spark.sql.GraftColumnBridge
  def minhashSig(c: Column): Column =
    GraftColumnBridge.column(MinHashSignature(GraftColumnBridge.expression(c)))
  def simhashSig(c: Column): Column =
    GraftColumnBridge.column(SimHashSignature(GraftColumnBridge.expression(c)))
}
