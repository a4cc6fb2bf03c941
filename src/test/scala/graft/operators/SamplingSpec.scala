package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Deterministic sampling: the bounded-aggregation reservoir must equal
  * the window form, strata must hit their exact allocations, and samples
  * must be stable and monotone in the budget. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-sampling-test")
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("per-key reservoir equals the window form (differential)") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val got = Sampling.samplePerKeyOf(docs, 7)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("priority").desc, col("doc_id"))
    val want = docs.withColumn("priority", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)").cast("double"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 7)
      .select("source", "rnk", "doc_id").orderBy("source", "rnk")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want)
    // exactly k per stratum (every source has ≥ 7 docs at sf0.01)
    got.groupBy(_._1).foreach { case (s, rows) => assert(rows.length == 7, s) }
  }

  test("reservoir has the prefix property: growing k extends the same draw") {
    val a = Sampling.samplePerKey(spark, dir, 5).collect().map(_.getLong(2)).toSet
    val b = Sampling.samplePerKey(spark, dir, 20).collect().map(_.getLong(2)).toSet
    assert(a.subsetOf(b), "growing k must only extend the sample (prefix property)")
  }

  test("stratified sample hits its integer allocation per stratum") {
    val got = Sampling.stratifiedSample(spark, dir, 120L)
    val perStratum = got.groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), first("alloc").as("alloc"),
        first("n_docs").as("n_docs")).collect()
    assert(perStratum.nonEmpty)
    perStratum.foreach { r =>
      val (kept, alloc, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // bucket uniformity: kept count is alloc ± the integer-rounding
      // band of a 10000-bucket hash over n docs
      val tol = math.max(3L, alloc / 2)
      assert(math.abs(kept - alloc) <= tol, s"${r.getString(0)}: kept=$kept alloc=$alloc n=$n")
    }
  }

  test("stratified membership is deterministic and monotone in the budget") {
    val b120 = Sampling.stratifiedSample(spark, dir, 120L).collect().map(_.getLong(0)).toSet
    val b120again = Sampling.stratifiedSample(spark, dir, 120L).collect().map(_.getLong(0)).toSet
    val b240 = Sampling.stratifiedSample(spark, dir, 240L).collect().map(_.getLong(0)).toSet
    assert(b120 == b120again)
    assert(b120.subsetOf(b240), "a bigger budget must only add docs")
  }
}
