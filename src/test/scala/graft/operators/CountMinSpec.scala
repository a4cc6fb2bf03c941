package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The relational Count-Min build: never undercounts (theorem — every
  * update increments all d counters an item reads back), over-count
  * bounded on the test corpus, and the gated query's booleans all fold
  * to true at sf0.001/sf0.01 (the driver gate replays sf0.01). */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-countmin-test")

  test("gated query: heavy items present with both theorem booleans true") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Aggregations.countMinChecked(spark, dir).collect()
      assert(rows.nonEmpty, s"$dir: no heavy items")
      val items = rows.map(_.getString(0)).toSeq
      assert(items == items.sorted)
      // hot keys must always be in the heavy set; at sf0.001 the user
      // population is small enough that cold keys legitimately cross the
      // n/k line too, so no exclusivity assertion
      assert(Seq("hot_0", "hot_1", "hot_2").forall(items.contains), s"$dir: $items")
      rows.foreach { r =>
        assert(r.getBoolean(2), s"$dir: ${r.getString(0)} undercounted — violates CM theorem")
        assert(r.getBoolean(3), s"$dir: ${r.getString(0)} over-count exceeded 2n/w")
      }
    }
  }

  test("estimates never undercount for ANY item, not just heavy ones") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val w = 512; val d = 4
    val stream = graft.sources.Tables.events(spark, dir)
      .select(when(col("user_id") % 4 === 0,
          concat(lit("hot_"), (col("user_id") % 3).cast("string")))
        .otherwise(concat(lit("cold_"), col("user_id").cast("string")))
        .as("item"))
    val bucketCols = (0 until d).map(r =>
      pmod(xxhash64(col("item"), lit(r)), lit(w.toLong)).as(s"b$r"))
    val tagged = stream.select(col("item") +: bucketCols: _*)
    val grid = tagged
      .select(posexplode(array((0 until d).map(r => col(s"b$r")): _*)).as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("c"))
    val all = tagged.groupBy("item", "b0", "b1", "b2", "b3").agg(count(lit(1)).as("cnt"))
    val est = (0 until d).foldLeft(all) { (df, r) =>
      df.join(broadcast(grid.filter(col("r") === r)
        .select(col("bucket").as(s"b$r"), col("c").as(s"c$r"))), Seq(s"b$r"))
    }.withColumn("est", least((0 until d).map(r => col(s"c$r")): _*))
    val bad = est.filter(col("est") < col("cnt")).count()
    assert(bad == 0L, s"$bad items undercounted")
  }
}
