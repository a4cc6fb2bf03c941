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

  test("restart from checkpoint is exactly-once through an idempotent batch sink") {
    // the reference's crash-resume contract (insta_scraper_enhanced.py:
    // 363-393) in streaming form: stop the query MID-STREAM, restart it
    // on the same checkpoint, and require (a) the restart resumes at the
    // next batch id instead of re-reading from scratch, and (b) the sink
    // holds every post exactly once — dedup state and source offsets both
    // recover from the checkpoint, and the per-batchId overwrite makes a
    // replayed in-flight batch idempotent rather than duplicated.
    val base = Files.createTempDirectory("graft_e2e_restart").toString
    val out = s"$base/out"
    val dirA = writeCreator(base, "creatorA", 8)
    val dirB = writeCreator(base, "creatorB", 8)
    def start(): org.apache.spark.sql.streaming.StreamingQuery = {
      def feed(dir: String, creator: String) = spark.readStream.format(fmt)
        .option("path", dir)
        .option("creator", creator).option("pagesPerTrigger", "1")
        .load()
      val routed = feed(dirA, "creatorA").unionByName(feed(dirB, "creatorB"))
        .withColumn("kind",
          when(col("body").startsWith("profile:"), "profile").otherwise("timeline"))
        .withColumn("ingest_ts", timestamp_seconds(lit(1700000000L) + col("page") * 60))
      val merged = Streams.pageMergeDedup(routed.filter(col("kind") === "timeline"))
      merged.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode(OutputMode.Append())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          batch.write.mode("overwrite").parquet(s"$out/batch=$bid")
        }
        .start()
    }
    // phase 1: let a couple of micro-batches commit, then stop mid-stream
    val q1 = start()
    val deadline = System.currentTimeMillis() + 30000
    while (q1.recentProgress.length < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    q1.stop(); q1.awaitTermination()
    val lastBatch1 = q1.recentProgress.map(_.batchId).maxOption.getOrElse(-1L)
    // phase 2: restart on the same checkpoint and drain
    val q2 = start()
    q2.processAllAvailable()
    val firstBatch2 = q2.recentProgress.map(_.batchId).minOption
    q2.stop(); q2.awaitTermination()
    firstBatch2.foreach(b2 =>
      assert(b2 >= lastBatch1, s"restart re-ran batch $b2 (phase 1 reached $lastBatch1)"))
    // 8 pages × ids p*4+i+100 (i<6) with 2-id scroll overlap → 34 distinct
    val written = spark.read.parquet(out)
    val perCreator = written.groupBy("creator_key")
      .agg(countDistinct("id").as("n_ids"), count(lit(1)).as("n_rows"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perCreator.keySet == Set("creatorA", "creatorB"))
    perCreator.foreach { case (c, (nIds, nRows)) =>
      assert(nIds == 34L, s"$c distinct ids: $nIds (lost rows across restart)")
      assert(nRows == 34L, s"$c rows: $nRows (duplicates across restart)")
    }
  }
}
