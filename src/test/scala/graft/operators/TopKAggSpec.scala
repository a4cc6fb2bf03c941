package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The typed-Aggregator top-k must be row-identical to the window
  * formulation it replaces at scale (same k, same tie-break). */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-topkagg-test")

  test("agg_topk_typed equals win_topk_per_customer row-for-row") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val typed = rows(Aggregations.topkTypedAgg(spark, dir))
    val window = rows(Windows.topkOrdersPerCustomer(spark, dir))
    assert(typed.nonEmpty)
    assert(typed == window)
  }
}
