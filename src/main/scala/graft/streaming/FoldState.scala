package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compaction for the in-stream index-maintenance fold state (VERDICT
  * r11 ask #3): the maintenance streams ([[Streams.nndMaintainStream]],
  * [[Streams.bm25MaintainStream]], [[Streams.ivfMaintainStream]]) write
  * one `batch_id=N` parquet partition per micro-batch forever, and every
  * serve unions ALL of them — correct, but at production batch counts
  * (a micro-batch every 10 s is 8,640 partitions/day) the FILE LISTING
  * becomes the serve bottleneck, not the data.
  *
  * Layout of one fold-state table (e.g. `stateDir/post`):
  * {{{
  *   table/batch_id=N/…            live fold partitions (one per batch)
  *   table/_compaction/gen=G/…     compacted generations (batch_id kept
  *                                 as a DATA column, so replay filters
  *                                 like `batch_id < myBatchId` still see
  *                                 the true fold history)
  *   table/_compaction/MANIFEST    single-line commit pointer:
  *                                 "gen=G watermark=W"
  * }}}
  * `_compaction` starts with an underscore, so Spark's file index
  * ignores it when reading `table/` — live-partition reads never see
  * the internal dirs.
  *
  * Commit protocol (the manifest-pointer move a table format makes —
  * Delta's _last_checkpoint / Iceberg's version-hint, re-derived here
  * over plain parquet): [[compact]] first writes the merged rows with
  * `batch_id <= watermark` to a FRESH `gen=G+1` dir (invisible: readers
  * only follow the manifest), then commits by writing MANIFEST.tmp and
  * renaming it over MANIFEST — `FileContext.rename(OVERWRITE)`, the
  * atomic single-file commit every HDFS-contract filesystem provides.
  * Only after the commit does garbage collection delete the superseded
  * live partitions and older generations, so every crash window is
  * safe: before the rename, readers see the old manifest and the old
  * partitions (the fresh gen dir is unreferenced garbage); after it,
  * the new gen plus `batch_id > watermark` — never a duplicate, never
  * a loss. GC failures leave orphans, not wrong answers, and re-running
  * [[compact]] collects them.
  *
  * Replay interaction: foreachBatch is at-least-once, so a batch with
  * id <= watermark can re-run after compaction and re-materialize its
  * `batch_id=N` dir. Readers filter live partitions to
  * `batch_id > watermark`, so the re-written partition is invisible —
  * its rows already live in the generation — and the next [[compact]]
  * deletes it. Compaction itself must only be invoked with a watermark
  * BELOW any batch id still in flight (run it from the maintenance
  * driver between micro-batches, or offline).
  *
  * At 100 TB: serve-side listing cost becomes
  * O(1 gen dir + batches-since-last-compaction) instead of O(total
  * batches); the generation's file count is `targetFiles`, sized like
  * any compaction output (graft's [[graft.operators.Maintenance]]
  * bin-packing planner is the byte-aware version of that decision).
  * StreamCheck's `compaction` gate measures exactly this: live-dir
  * count collapses, serve rows stay identical. */
object FoldState {

  private def hadoopFs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** The committed (generation, watermark) pointer, if any. */
  def manifest(spark: SparkSession, table: String): Option[(Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$table/_compaction/MANIFEST")
    val fs = hadoopFs(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val line =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val kv = line.split("\\s+").iterator
        .map(_.split("=", 2)).collect { case Array(k, v) => k -> v.toLong }
        .toMap
      Some((kv("gen"), kv("watermark")))
    }
  }

  private def tryRead(spark: SparkSession, path: String): Option[DataFrame] =
    try Some(spark.read.parquet(path))
    catch { case _: AnalysisException => None } // no dir / no data files yet

  /** Effective fold state: committed generation ∪ live partitions above
    * the watermark (all of them when no compaction has committed).
    * Rows carry `batch_id` (long) so fold-replay filters keep working;
    * None when no state exists at all. */
  def read(spark: SparkSession, table: String): Option[DataFrame] = {
    def live(min: Long): Option[DataFrame] =
      tryRead(spark, table).map(
        _.withColumn("batch_id", col("batch_id").cast("long"))
          .filter(col("batch_id") > min))
    manifest(spark, table) match {
      case None => live(Long.MinValue)
      case Some((gen, wm)) =>
        val compacted = tryRead(spark, s"$table/_compaction/gen=$gen")
          .map(_.withColumn("batch_id", col("batch_id").cast("long")))
        (compacted, live(wm)) match {
          case (Some(c), Some(l)) => Some(c.unionByName(l))
          case (Some(c), None) => Some(c)
          case (None, l) => l // unreadable gen = corrupt commit; fail soft to live
        }
    }
  }

  /** Live `batch_id=N` partition-dir count — the number serve-side file
    * listing pays per query and the quantity the StreamCheck compaction
    * gate pins. */
  def livePartitionCount(spark: SparkSession, table: String): Int = {
    val p = new org.apache.hadoop.fs.Path(table)
    val fs = hadoopFs(spark, p)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch_id="))
  }

  /** Highest live `batch_id` under `table`, if any — the natural
    * compaction watermark when the fold stream is quiesced. */
  def maxLiveBatchId(spark: SparkSession, table: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(table)
    val fs = hadoopFs(spark, p)
    if (!fs.exists(p)) None
    else {
      val ids = fs.listStatus(p).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        .map(_.getPath.getName.drop("batch_id=".length).toLong).toSeq
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** Merge every fold partition with `batch_id <= watermark` (plus the
    * previous generation) into one new generation, commit it atomically,
    * then garbage-collect the superseded partitions and generations.
    * Idempotent: re-running with the same (or a lower) watermark is a
    * no-op; crashing anywhere re-runs safely (see the commit-protocol
    * note above). */
  def compact(spark: SparkSession, table: String, watermark: Long,
              targetFiles: Int = 4): Unit = {
    val cur = manifest(spark, table)
    val prevWm = cur.map(_._2).getOrElse(Long.MinValue)
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = hadoopFs(spark, root)
    if (watermark > prevWm) {
      val toMerge = read(spark, table) match {
        case None => return
        case Some(df) => df.filter(col("batch_id") <= watermark)
      }
      val nextGen = cur.map(_._1 + 1).getOrElse(0L)
      toMerge.coalesce(math.max(1, targetFiles))
        .write.mode("overwrite")
        .parquet(s"$table/_compaction/gen=$nextGen")
      // commit: write-temp + atomic rename-over (the one atomic
      // primitive the HDFS contract guarantees for single files)
      val tmp = new org.apache.hadoop.fs.Path(s"$table/_compaction/MANIFEST.tmp")
      val man = new org.apache.hadoop.fs.Path(s"$table/_compaction/MANIFEST")
      val out = fs.create(tmp, true)
      try out.write(s"gen=$nextGen watermark=$watermark\n".getBytes("UTF-8"))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        man.toUri, spark.sessionState.newHadoopConf())
      fc.rename(tmp, man, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    // GC (also collects orphans from an earlier crashed run): superseded
    // live partitions, superseded generations, stray tmp manifests.
    // Failures here are benign — readers no longer reference any of it.
    manifest(spark, table).foreach { case (gen, wm) =>
      if (fs.exists(root))
        fs.listStatus(root).iterator
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
          .filter(_.getPath.getName.drop("batch_id=".length).toLong <= wm)
          .foreach(s => fs.delete(s.getPath, true))
      val compDir = new org.apache.hadoop.fs.Path(s"$table/_compaction")
      if (fs.exists(compDir))
        fs.listStatus(compDir).iterator.foreach { s =>
          val n = s.getPath.getName
          if (s.isDirectory && n.startsWith("gen=") &&
            n.drop("gen=".length).toLong < gen) fs.delete(s.getPath, true)
          else if (n == "MANIFEST.tmp") fs.delete(s.getPath, false)
        }
    }
  }
}
