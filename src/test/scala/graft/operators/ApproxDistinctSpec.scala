package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** HLL++ sketch accuracy vs the exact distinct count. */
class ApproxDistinctSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-approx-test")

  test("approx_count_distinct stays within 5% of exact at rsd=0.02") {
    val rows = Aggregations.approxDistinct(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.get(0)}: approx=$approx exact=$exact")
    }
  }
}
