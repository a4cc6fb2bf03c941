package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** QA for the SQ8 scalar-quantization family: code-space invariants of
  * the integer quantizer, and the accuracy contract of compressed-domain
  * search against full-precision exact search on the real corpus. */
class Sq8Spec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-sq8-test")
  val dir = "/root/testdata/sf0.01"

  test("codes are int8-saturating: range [-127,127] and every vector's max |code| is 127") {
    import org.apache.spark.sql.functions._
    val coded = Similarity.sq8Coded(spark, dir)
      .withColumn("cmax", expr("aggregate(code, 0L, (a, x) -> greatest(a, abs(cast(x as bigint))))"))
    val bad = coded.filter(col("cmax") =!= 127L).count()
    // round-half-up of |m|·127/ma hits exactly 127 at |m| = ma for every
    // vector (255/2 floors to 127), and can never exceed it
    assert(bad === 0L, s"$bad vectors whose max |code| != 127")
  }

  test("compressed-domain recall@5 vs exact search clears the SQ8 deployment floor") {
    val row = Similarity.sq8Recall(spark, dir).collect().head
    val recall = row.getAs[Double]("mean_recall")
    // int8 keeps ~7 bits of the ~10-bit milli components; top-5 neighbor
    // sets should survive nearly intact
    assert(recall >= 0.8, s"sq8 recall@5 $recall below 0.8")
    val fp32 = row.getAs[Long]("bytes_fp32")
    val sq8 = row.getAs[Long]("bytes_sq8")
    assert(fp32 > 3L * sq8, s"compression accounting off: fp32=$fp32 sq8=$sq8")
  }

  test("compressed cosine tracks exact cosine within the int8 error budget") {
    import org.apache.spark.sql.functions._
    val exact = Similarity.annMultiQueryTopK(spark, dir)
      .select(col("q_id"), col("vec_id"), col("cos").as("cos_exact"))
    val sq8 = Similarity.sq8MultiQueryTopK(spark, dir)
      .select(col("q_id"), col("vec_id"), col("cos").as("cos_sq8"))
    val maxErr = exact.join(sq8, Seq("q_id", "vec_id"))
      .agg(max(abs(col("cos_exact") - col("cos_sq8"))))
      .collect().head.getDouble(0)
    // worst-case relative quantization error per component is ~1/254;
    // cosine of 64-dim vectors stays well inside a few percent
    assert(maxErr < 0.05, s"max |cos_exact - cos_sq8| = $maxErr")
  }
}
