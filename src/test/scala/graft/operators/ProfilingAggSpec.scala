package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sequential recomputation of the round-8 profiling aggregates:
  * equi-depth histogram (distributed prefix-sum ranking), chi-squared
  * contingency cells, and dictionary-granular Gini. Each operator's
  * output is checked against a straightforward single-threaded
  * re-derivation from the same parquet — independent of both the Spark
  * plan and the DuckDB oracle. */
class ProfilingAggSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-profiling-test")
  private val dir = "/root/testdata/sf0.001"

  test("equi-depth histogram: buckets match a sequential value-granular ranking") {
    val cents = graft.sources.Tables.orders(spark, dir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val byValue = cents.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val values = byValue.keys.toArray.sorted
    var cum = 0L
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    values.foreach { v =>
      val b = cum * 16L / n
      val (nr, mn, mx) = want.getOrElse(b, (0L, Long.MaxValue, Long.MinValue))
      want(b) = (nr + byValue(v), math.min(mn, v), math.max(mx, v))
      cum += byValue(v)
    }
    val got = Aggregations.equidepthHist(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want.toMap, s"equi-depth mismatch:\n got  $got\n want $want")
    // depth invariant: every bucket within one value-run of n/16
    val maxRun = byValue.values.max
    got.values.foreach { case (nr, _, _) =>
      assert(nr <= n / 16 + maxRun && nr >= 1, s"bucket depth $nr out of band")
    }
  }

  test("chi2 cells: observed/expected/contribution match a sequential contingency") {
    val seg = graft.sources.Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val obs = graft.sources.Tables.orders(spark, dir)
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (seg(r.getLong(0)), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val c = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = obs.values.sum
    val got = Aggregations.chi2Independence(spark, dir).collect()
    assert(got.length == obs.size)
    got.foreach { row =>
      val (s, p, o) = (row.getString(0), row.getString(1), row.getLong(2))
      assert(o == obs((s, p)))
      assert(row.getLong(3) == r(s) && row.getLong(4) == c(p))
      assert(row.getLong(5) == r(s) * c(p) * 1000000L / n)
      val d = (o * n - r(s) * c(p)).toDouble
      assert(row.getDouble(6) == d * d / (n * r(s) * c(p)).toDouble)
    }
  }

  test("gini: dictionary algebra equals the per-row rank formula, ties included") {
    val rows = graft.sources.Tables.customer(spark, dir)
      .select(col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).view.mapValues { vs =>
      val x = vs.map(_._2).sorted
      val nn = x.length.toLong
      val s0 = x.sum
      val s1 = x.zipWithIndex.map { case (v, i) => v * (i + 1L) }.sum
      (nn, s0, (2 * s1 - (nn + 1) * s0) * 1000000L / (nn * s0))
    }.toMap
    val got = Aggregations.giniBySegment(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"gini mismatch:\n got  $got\n want $want")
  }
}
