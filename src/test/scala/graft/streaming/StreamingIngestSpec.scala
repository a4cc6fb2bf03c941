package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** EP-1 composed end-to-end as ONE streaming DAG from existing operators:
  * paged DSv2 source (O-12) → response router (O-14) → page-merge dedup
  * (O-54) → partitioned parquet sink via foreachBatch (O-5) — the
  * reference scraper's spine (insta_scraper_enhanced.main), scraping
  * transport excluded, running incrementally with checkpointed offsets
  * (O-10 resume for free). */
class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-ingest-e2e-test")
  import spark.implicits._

  private val fmt = classOf[graft.sources.paged.PagedDataSource].getName

  /** Pages for one creator: page 0 leads with a profile response, then
    * timeline posts; consecutive pages overlap by 2 post ids (scroll
    * overlap the merge must collapse). */
  private def writeCreator(base: String, creator: String, pages: Int): String = {
    val dir = s"$base/$creator"
    new java.io.File(dir).mkdirs()
    for (p <- 0 until pages) {
      val posts = (0 until 6).map(i => s"${p * 4 + i + 100}\tpost:$creator:${p * 4 + i}")
      val lines = if (p == 0) s"1\tprofile:$creator" +: posts else posts
      Files.write(java.nio.file.Paths.get(f"$dir/page-$p%05d.txt"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    dir
  }

  test("paged source → router → page merge → partitioned sink, incrementally") {
    val base = Files.createTempDirectory("graft_e2e").toString
    val out = s"$base/out"
    def feed(creator: String) = spark.readStream.format(fmt)
      .option("path", writeCreator(base, creator, 3))
      .option("creator", creator).option("pagesPerTrigger", "1")
      .load()
    // O-14 router: classify each harvested body by its payload shape
    val routed = feed("creatorA").unionByName(feed("creatorB"))
      .withColumn("kind",
        when(col("body").startsWith("profile:"), "profile").otherwise("timeline"))
      .withColumn("ingest_ts", timestamp_seconds(lit(1700000000L) + col("page") * 60))
    // O-54 page merge on the timeline branch only
    val merged = Streams.pageMergeDedup(routed.filter(col("kind") === "timeline"))
    val q = merged.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").partitionBy("creator_key").parquet(out)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val written = spark.read.parquet(out)
    // per creator: pages carry ids 100..105, 104..109, 108..113 → 14 distinct
    val perCreator = written.groupBy("creator_key")
      .agg(countDistinct("id").as("n_ids"), count(lit(1)).as("n_rows"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perCreator.keySet == Set("creatorA", "creatorB"))
    perCreator.foreach { case (c, (nIds, nRows)) =>
      assert(nIds == 14L, s"$c distinct ids: $nIds")
      assert(nRows == 14L, s"$c rows after merge: $nRows (dedup failed)")
    }
    // no profile rows leaked through the router into the timeline sink
    assert(written.filter(col("body").startsWith("profile:")).count() == 0)
    // partitioned layout: one directory per creator (O-5's layout)
    assert(new java.io.File(s"$out/creator_key=creatorA").isDirectory)
    assert(new java.io.File(s"$out/creator_key=creatorB").isDirectory)
  }
}
