package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL surface produces the same results as the DataFrame API. */
class ViewsSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-views-test")
  val dir = "/root/testdata/sf0.01"

  test("SQL pricing summary equals the DataFrame version") {
    Views.registerStar(spark, dir)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
           pyround(avg(l_quantity), 2) AS avg_qty
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""").collect()
    val df = graft.operators.Aggregations.pricingSummary(spark, dir)
      .selectExpr("l_returnflag", "l_linestatus", "count_order", "pyround(avg_qty, 2)")
      .collect()
    assert(sql.length == df.length && sql.length > 0)
    sql.zip(df).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getString(1) == b.getString(1))
      assert(a.getLong(2) == b.getLong(2))
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-9)
    }
  }

  test("IG views are SQL-queryable") {
    Views.registerIg(spark)
    val n = spark.sql(
      "SELECT count(DISTINCT creator_key) AS n FROM ig_posts").collect()(0).getLong(0)
    assert(n == 9)
    val top = spark.sql(
      """SELECT p.creator_key, count(*) AS n_posts
         FROM ig_posts p JOIN ig_profiles pr USING (creator_key)
         WHERE pr.follower_count > 0
         GROUP BY p.creator_key ORDER BY n_posts DESC LIMIT 1""").collect()(0)
    assert(top.getLong(1) > 0)
  }
}
