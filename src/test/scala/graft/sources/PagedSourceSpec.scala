package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The O-12 paginated DSv2 connector: paced micro-batch admission, stop
  * conditions, restartable page offsets, and composition with the
  * downstream page-merge dedup (O-54). */
class PagedSourceSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-paged-test")
  import spark.implicits._

  private val fmt = classOf[graft.sources.paged.PagedDataSource].getName

  /** 5 pages × 20 rows; consecutive pages overlap by 5 ids (scroll overlap). */
  private def writePages(): String = {
    val dir = Files.createTempDirectory("graft_pages").toString
    for (p <- 0 until 5) {
      val lines = (0 until 20).map(i => s"${p * 15 + i}\tbody-$p-$i")
      Files.write(java.nio.file.Paths.get(s"$dir/page-0000$p.txt"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    dir
  }

  test("micro-batch read paces pages and stops at targetRows") {
    val dir = writePages()
    val df = spark.readStream.format(fmt)
      .option("path", dir).option("creator", "creatorA")
      .option("pagesPerTrigger", "2").option("targetRows", "50")
      .load()
    val q = df.writeStream.format("memory").queryName("paged_out")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val out = spark.table("paged_out")
    val pages = out.select("page").distinct().as[Int].collect().sorted
    q.stop()
    // 20 rows/page, target 50 → pages 0,1 (40 rows) then page 2 (60 ≥ 50), never 3+
    assert(pages.toSeq == Seq(0, 1, 2))
    assert(out.count() == 60)
    assert(out.select("creator_key").distinct().as[String].collect().toSeq == Seq("creatorA"))
  }

  test("maxPages caps the scroll like the reference's 15-scroll limit") {
    val dir = writePages()
    val df = spark.readStream.format(fmt)
      .option("path", dir).option("pagesPerTrigger", "10").option("maxPages", "2")
      .load()
    val q = df.writeStream.format("memory").queryName("paged_cap_out")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val pages = spark.table("paged_cap_out").select("page").distinct().as[Int].collect().sorted
    q.stop()
    assert(pages.toSeq == Seq(0, 1))
  }

  test("stagnant pages stop the scroll once enough rows are harvested") {
    val dir = Files.createTempDirectory("graft_stagnant").toString
    // page 0: ids 0..9; pages 1-2 repeat them exactly (stagnant); page 3
    // would bring fresh ids but must never be admitted
    val pages = Seq(0 until 10, 0 until 10, 0 until 10, 20 until 30)
    pages.zipWithIndex.foreach { case (ids, p) =>
      Files.write(java.nio.file.Paths.get(f"$dir/page-$p%05d.txt"),
        ids.map(i => s"$i\tb").mkString("\n").getBytes("UTF-8"))
    }
    val df = spark.readStream.format(fmt)
      .option("path", dir).option("pagesPerTrigger", "1")
      .option("stagnantLimit", "2").option("minRowsForStagnantStop", "10")
      .load()
    val q = df.writeStream.format("memory").queryName("stagnant_out")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val got = spark.table("stagnant_out").select("page").distinct().as[Int].collect().sorted
    q.stop()
    assert(got.toSeq == Seq(0, 1, 2), s"scroll did not stop on stagnation: ${got.toSeq}")
  }

  test("composes with pageMergeDedup: overlapping scroll pages dedup to distinct ids") {
    val dir = writePages()
    val df = spark.readStream.format(fmt)
      .option("path", dir).option("pagesPerTrigger", "2").option("targetRows", "50")
      .load()
      .withColumn("ingest_ts", timestamp_seconds(lit(1700000000L) + col("page") * 60))
    val q = graft.streaming.Streams.pageMergeDedup(df).writeStream
      .format("memory").queryName("paged_dedup_out").outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val ids = spark.table("paged_dedup_out").select("id").as[Long].collect().sorted
    q.stop()
    // pages 0..2 carry ids 0..19, 15..34, 30..49 → exactly 0..49 once each
    assert(ids.toSeq == (0L until 50L))
  }

  test("batch read loads every available page") {
    val dir = writePages()
    val df = spark.read.format(fmt).option("path", dir).load()
    assert(df.columns.toSeq == Seq("creator_key", "page", "id", "body"))
    assert(df.count() == 100)
    assert(df.select("page").distinct().count() == 5)
    assert(df.filter(col("body") === "body-4-19").select("id").as[Long].head() == 79L)
  }
}
