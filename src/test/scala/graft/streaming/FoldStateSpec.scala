package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct checks on the fold-state compaction machinery: size-tiered
  * incremental merges (r12 verdict #4), the loud-failure read of a
  * half-deleted commit (ADVICE r12 medium), manifest/dir-name parse
  * robustness, and the single-writer lock (ADVICE r12 lows). */
class FoldStateSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-foldstate-test")
  import spark.implicits._

  private def fsOf(table: String) =
    new Path(table).getFileSystem(spark.sessionState.newHadoopConf())

  private def newTable(): String =
    java.nio.file.Files.createTempDirectory("graft_foldstate").toString + "/t"

  private def fold(table: String, batchId: Long, rows: Seq[(Long, String)]): Unit =
    rows.toDF("k", "v").write.mode("overwrite")
      .parquet(s"$table/batch_id=$batchId")

  private def readKeys(table: String): Seq[(Long, Long, String)] =
    FoldState.read(spark, table).get
      .select(col("batch_id"), col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq

  test("minor compaction merges only the live delta; reads union gens + tail") {
    val t = newTable()
    fold(t, 0, Seq((1L, "a")))
    fold(t, 1, Seq((2L, "b")))
    FoldState.compact(spark, t, watermark = 1)
    assert(FoldState.manifest(spark, t) === Some((Seq(0L), 1L)))
    fold(t, 2, Seq((3L, "c")))
    fold(t, 3, Seq((4L, "d")))
    FoldState.compact(spark, t, watermark = 3)
    // the second compaction wrote a NEW generation from batches 2,3 only
    assert(FoldState.manifest(spark, t) === Some((Seq(0L, 1L), 3L)))
    val gen1 = spark.read.parquet(s"$t/_compaction/gen=1")
      .select("batch_id").as[Long].collect().toSet
    assert(gen1 == Set(2L, 3L), "minor compaction must contain only the delta")
    assert(readKeys(t) ==
      Seq((0L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "c"), (3L, 4L, "d")))
    // tier merge kicks in past maxGens: two smallest gens fold into one
    fold(t, 4, Seq((5L, "e")))
    FoldState.compact(spark, t, watermark = 4, maxGens = 2)
    val Some((gens, wm)) = FoldState.manifest(spark, t)
    assert(wm == 4L && gens.size == 2,
      s"tier merge must cap the generation count (got $gens)")
    assert(readKeys(t) == Seq((0L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "c"),
      (3L, 4L, "d"), (4L, 5L, "e")))
  }

  test("read fails loudly when the manifest references a deleted generation") {
    val t = newTable()
    fold(t, 0, Seq((1L, "a")))
    FoldState.compact(spark, t, watermark = 0)
    fold(t, 1, Seq((2L, "b")))
    fsOf(t).delete(new Path(s"$t/_compaction/gen=0"), true)
    val e = intercept[IllegalStateException] { FoldState.read(spark, t) }
    assert(e.getMessage.contains("gen=0"),
      "must not silently serve a truncated live-only state")
  }

  test("an unparseable MANIFEST is treated as missing, not a crash") {
    val t = newTable()
    fold(t, 0, Seq((1L, "a")))
    fold(t, 1, Seq((2L, "b")))
    val fs = fsOf(t)
    fs.mkdirs(new Path(s"$t/_compaction"))
    val out = fs.create(new Path(s"$t/_compaction/MANIFEST"), true)
    out.write("gens=oops watermark=nope\n".getBytes("UTF-8")); out.close()
    assert(FoldState.manifest(spark, t).isEmpty)
    // serving falls back to ALL live partitions (nothing was GC'd yet)
    assert(readKeys(t) == Seq((0L, 1L, "a"), (1L, 2L, "b")))
  }

  test("stray non-numeric partition dirs are ignored, not a crash") {
    val t = newTable()
    fold(t, 0, Seq((1L, "a")))
    fsOf(t).mkdirs(new Path(s"$t/batch_id=__HIVE_DEFAULT_PARTITION__"))
    assert(FoldState.maxLiveBatchId(spark, t) === Some(0L))
    assert(FoldState.livePartitionCount(spark, t) == 1)
    FoldState.compact(spark, t, watermark = 0) // must not throw in GC
    assert(FoldState.manifest(spark, t) === Some((Seq(0L), 0L)))
  }

  test("compact is single-writer: a held lock fails loudly, a stale lock is broken") {
    val t = newTable()
    fold(t, 0, Seq((1L, "a")))
    val fs = fsOf(t)
    val lock = new Path(s"$t/_compaction/_LOCK")
    fs.mkdirs(lock.getParent)
    fs.create(lock, false).close()
    val e = intercept[IllegalStateException] {
      FoldState.compact(spark, t, watermark = 0)
    }
    assert(e.getMessage.contains("single-writer"))
    // a crashed compactor's lock (older than the TTL) must not wedge the
    // pipeline: it is broken and compaction proceeds
    FoldState.compact(spark, t, watermark = 0, lockTtlMs = 0L)
    assert(FoldState.manifest(spark, t) === Some((Seq(0L), 0L)))
    assert(!fs.exists(lock), "the lock must be released after compaction")
  }

  test("crash-orphaned uncommitted generations are swept on the next compact") {
    val t = newTable()
    fold(t, 0, Seq((1L, "a")))
    FoldState.compact(spark, t, watermark = 0)
    // simulate a crash AFTER writing gen=1 but BEFORE the manifest commit
    fold(t, 1, Seq((2L, "b")))
    Seq((99L, "garbage")).toDF("k", "v").withColumn("batch_id", lit(1L))
      .write.parquet(s"$t/_compaction/gen=1")
    // readers never see the orphan (manifest still points at gen=0 only)
    assert(readKeys(t) == Seq((0L, 1L, "a"), (1L, 2L, "b")))
    // the re-run sweeps it and writes the REAL gen=1 from the live delta
    FoldState.compact(spark, t, watermark = 1)
    assert(FoldState.manifest(spark, t) === Some((Seq(0L, 1L), 1L)))
    assert(readKeys(t) == Seq((0L, 1L, "a"), (1L, 2L, "b")))
  }
}
