package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-layout contract: writing both join sides bucketed on the
  * join key makes the join AND the keyed aggregation exchange-free (the
  * write-time shuffle is reused by every subsequent query), with results
  * identical to the shuffled plan. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-bucketing-test")
  val dir = "/root/testdata/sf0.001"

  test("co-located bucketed join + agg: zero exchanges, same result as shuffled") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    Bucketing.writeBucketed(orders, "orders_b", s"$tmp/orders_b", 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "lineitem_b", s"$tmp/lineitem_b", 8, Seq("l_orderkey"))
    // sf0.001 orders would broadcast, which bypasses the distribution
    // machinery under test — force the sort-merge path the real scale
    // would take
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Bucketing.bucketedOrderRevenue(spark)
      bucketed.collect()
      val plan = bucketed.queryExecution.executedPlan.toString.split("Initial Plan")(0)
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg still shuffles:\n${plan.take(3000)}")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n${plan.take(2000)}")

      val expect = orders
        .join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(20,4)")).as("sum_qty"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
      assert(canon(bucketed) == canon(expect),
        "bucketed result differs from the shuffled join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned layout: a lang filter prunes to its partition directory") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-partitioned").toString
    val docs = Tables.documents(spark, dir)
    Bucketing.writePartitioned(docs, s"$tmp/docs", Seq("lang"))
    val en = spark.read.parquet(s"$tmp/docs").filter(col("lang") === "en")
    en.collect()
    val plan = en.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert("PartitionFilters: \\[.*\\(lang#\\d+ = en\\)".r.findFirstIn(plan).isDefined,
      s"lang filter not pruned to partitions:\n${plan.take(2000)}")
    // pruning is real: only the lang=en directory is read
    val expectEn = docs.filter(col("lang") === "en").count()
    assert(en.count() == expectEn)
    assert(expectEn > 0)
  }
}
