package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** The codegen'd expressions must be bit-identical to the SQL-function
  * formulations they replaced (the DuckDB oracles were written against
  * those), on arbitrary data — not just the shipped test tables. */
object VectorOpsSpec extends Properties("vector-ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  lazy val spark = graft.Sessions.local("4", "graft-vecops-test")
  import spark.implicits._

  private val floatGen: Gen[Float] =
    Gen.chooseNum(-2000000, 2000000).map(_ / 1000000.0f)
  private val vecGen: Gen[List[Float]] = Gen.choose(1, 16)
    .flatMap(n => Gen.listOfN(n, floatGen))

  property("quantized_dot equals the aggregate(zip_with(round)) SQL form") =
    Prop.forAll(vecGen, vecGen) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val df = Seq((a, b)).toDF("a", "b")
        .withColumn("fast", VectorOps.quantDot(col("a"), col("b")))
        .withColumn("slow", expr(
          """aggregate(zip_with(a, b, (x, y) ->
               cast(round(cast(x as double) * 1000.0) as bigint) *
               cast(round(cast(y as double) * 1000.0) as bigint)),
             0L, (acc, v) -> acc + v)"""))
      val r = df.select("fast", "slow").collect()(0)
      val ok = r.getLong(0) == r.getLong(1)
      if (!ok) println(s"DOT MISMATCH a=$a b=$b fast=${r.getLong(0)} slow=${r.getLong(1)}")
      ok
    }

  private val tokGen: Gen[List[String]] = Gen.choose(1, 12).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "δδδ", "tok1", "tok2",
      "x", "yy", "zzz", "émoji🙂", "word word")))

  property("intersect_count equals size(array_intersect), dups and nulls included") =
    Prop.forAll(tokGen, tokGen) { (a, b) =>
      // keep duplicates (the builtin dedups; ours must agree) and add
      // nulls on both sides so the null-matches-null path is exercised
      val an = a ++ List(null, null)
      val bn = b ++ List(null)
      val df = Seq((an, bn)).toDF("a", "b")
        .withColumn("fast", ArrayOps.intersectCount(col("a"), col("b")))
        .withColumn("slow", expr("size(array_intersect(a, b))"))
        .withColumn("sql_form", expr("intersect_count(a, b)"))
      val r = df.select("fast", "slow", "sql_form").collect()(0)
      val ok = r.getInt(0) == r.getInt(1) && r.getInt(2) == r.getInt(1)
      if (!ok) println(s"INTERSECT MISMATCH a=$an b=$bn fast=${r.getInt(0)} slow=${r.getInt(1)}")
      ok
    }

  property("minhash_sig equals the md5/conv + fold SQL form") =
    Prop.forAll(tokGen) { toks0 =>
      val toks = toks0.distinct
      val mins = MinHashUtil.A.indices
        .map(i => s"least(acc[$i], (${MinHashUtil.A(i)} * h + ${MinHashUtil.B(i)}) % ${MinHashUtil.P})")
        .mkString(", ")
      val df = Seq(Tuple1(toks)).toDF("toks")
        .withColumn("fast", MinHash.minhashSig(col("toks")))
        .withColumn("hs", expr(
          "transform(toks, s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint))"))
        .withColumn("slow", expr(
          s"aggregate(hs, array_repeat(cast(${MinHashUtil.P} as bigint), 8), (acc, h) -> array($mins))"))
      val r = df.select("fast", "slow").collect()(0)
      val ok = r.getSeq[Long](0) == r.getSeq[Long](1)
      if (!ok) println(s"MINHASH MISMATCH toks=$toks fast=${r.getSeq[Long](0)} slow=${r.getSeq[Long](1)}")
      ok
    }

  property("simhash_sig equals the vote-fold SQL form") =
    Prop.forAll(tokGen) { toks0 =>
      val toks = toks0.distinct
      val df = Seq(Tuple1(toks)).toDF("toks")
        .withColumn("fast", MinHash.simhashSig(col("toks")))
        .withColumn("hs", expr(
          "transform(toks, t -> cast(conv(substring(md5(t), 1, 4), 16, 10) as int))"))
        .withColumn("votes", expr(
          """aggregate(hs, array_repeat(0, 16),
               (acc, h) -> zip_with(acc, sequence(0, 15),
                 (a, j) -> a + if((shiftright(h, j) & 1) = 1, 1, -1)))"""))
        .withColumn("slow", expr(
          """aggregate(zip_with(votes, sequence(0, 15),
               (s, j) -> if(s > 0, cast(shiftleft(1, j) as bigint), cast(0 as bigint))),
             cast(0 as bigint), (acc, v) -> acc + v)"""))
      val r = df.select("fast", "slow").collect()(0)
      val ok = r.getLong(0) == r.getLong(1)
      if (!ok) println(s"SIMHASH MISMATCH toks=$toks fast=${r.getLong(0)} slow=${r.getLong(1)}")
      ok
    }
}
