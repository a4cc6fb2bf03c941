package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The deterministic co-moment correlation must stay in [-1, 1] and agree
  * with Spark's built-in corr()/covar_samp() to float tolerance — the
  * determinism rewrite may not change the statistic. */
class CorrSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-corr-test")

  test("agg_corr_value_time is bounded and matches built-in corr/covar") {
    val dir = "/root/testdata/sf0.001"
    val det = Aggregations.corrValueTime(spark, dir)
    val builtin = graft.sources.Tables.orders(spark, dir)
      .select(col("o_custkey"),
        col("o_totalprice").as("y"),
        datediff(col("o_orderdate").cast("date"), to_date(lit("1992-01-01")))
          .cast("double").as("x"))
      .groupBy("o_custkey")
      .agg(corr(col("x"), col("y")).as("corr_b"), covar_samp(col("x"), col("y")).as("covar_b"))
    val joined = det.join(builtin, "o_custkey").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val c = r.getAs[Double]("corr_value_time")
      assert(math.abs(c) <= 1.0 + 1e-12, s"corr out of range: $r")
      assert(math.abs(c - r.getAs[Double]("corr_b")) <= 1e-6, s"corr drift: $r")
      val cv = r.getAs[Double]("covar_samp")
      val cvb = r.getAs[Double]("covar_b")
      assert(math.abs(cv - cvb) <= 1e-6 * math.max(1.0, math.abs(cvb)), s"covar drift: $r")
    }
  }
}
