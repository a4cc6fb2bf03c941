package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** Streaming PERFORMANCE evidence (VERDICT r8 ask #5): every stateful
  * mirror is correctness-proven by batch-equivalence differentials
  * (FunnelStreamSpec / StreamsSpec), but its O(1)-per-key /
  * bounded-state claims were design comments only. This main runs each
  * mirror over the real events stream at 1× (sf0.1, 100k events) and
  * 10× (target/sf1, 1M events, time-EXTENDED per make_sf1.py) through
  * the noop sink, and records per run:
  *
  *   - rows/s (input rows over wall time — single micro-batch, so this
  *     is fold throughput, not trigger latency)
  *   - state rows (the state store's numRowsTotal after the batch)
  *   - keys (the mirror's key universe in that data: distinct users for
  *     per-user mirrors, distinct event types for the SpaceSaving sketch,
  *     d·w for Count-Min)
  *   - state_per_key_ppm = state_rows · 10⁶ / keys
  *
  * Gate: state_per_key must stay FLAT at 10× input (ratio ≤ 1.5) — the
  * numeric form of "O(1) state per key forever". For the fixed-key
  * sketches (SpaceSaving by event_type, Count-Min's d·w grid) that also
  * pins ABSOLUTE state flat, since their key universe doesn't grow with
  * data. Writes STREAMCHECK.json; exits nonzero on a gate breach.
  *
  * (Why not gate absolute state for per-user mirrors: 10× stress data
  * shifts user ids per replica — 10× users is the intended shape, and
  * keyed state sharding across executors is exactly how a cluster
  * absorbs it. The per-key bound is the scale-safety claim.)
  */
object StreamCheck {
  private case class Run(name: String, tag: String, inputRows: Long,
                         wallS: Double, stateRows: Long, keys: Long) {
    def rowsPerS: Long = if (wallS > 0) (inputRows / wallS).toLong else 0L
    def statePerKeyPpm: Long = if (keys > 0) stateRows * 1000000L / keys else 0L
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val big = if (args.length > 1) args(1) else "target/sf1"
    val spark =
      Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-streamcheck")
    import spark.implicits._
    implicit val ss: SparkSession = spark

    def eventsOf(dir: String): Dataset[Event] =
      Streams.readEventsStream(spark, dir)
        .select(col("user_id"), col("ts"), col("event_type"),
          col("value"), col("event_id"))
        .as[Event]

    // (name, outputMode, key kind, stream builder). Output mode follows
    // the operator: flatMapGroupsWithState declares Append itself;
    // mapGroupsWithState and aggregations run under Update.
    val mirrors: Seq[(String, String, String, String => DataFrame)] = Seq(
      ("funnel", "update", "user", d => Streams.funnelStream(eventsOf(d)).toDF),
      ("ewma", "update", "user", d => Streams.ewmaStream(eventsOf(d)).toDF),
      ("anomaly", "append", "user", d => Streams.anomalyStream(eventsOf(d)).toDF),
      ("drawdown", "append", "user", d => Streams.drawdownStream(eventsOf(d)).toDF),
      ("last_touch", "append", "user", d => Streams.lastTouchStream(eventsOf(d)).toDF),
      ("transitions", "append", "user", d => Streams.transitionsStream(eventsOf(d)).toDF),
      ("sessionize", "append", "user", d => Streams.sessionize(eventsOf(d)).toDF),
      ("topk_spacesaving", "append", "type", d => Streams.topkStream(eventsOf(d)).toDF),
      ("countmin", "update", "grid", d => Streams.countMinStream(
        Streams.readEventsStream(spark, d).select(col("user_id").as("item")))))

    def keysOf(dir: String, kind: String): Long = kind match {
      case "user" =>
        spark.read.parquet(s"$dir/events.parquet").select("user_id").distinct().count()
      case "type" =>
        spark.read.parquet(s"$dir/events.parquet").select("event_type").distinct().count()
      case _ => 4L * 512L // Count-Min d·w — fixed by construction
    }

    def runOne(name: String, mode: String, kind: String,
               mk: String => DataFrame, dir: String, tag: String): Run = {
      val ckpt = new java.io.File(s"target/streamcheck/ckpt_${name}_$tag")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      if (ckpt.exists()) rm(ckpt)
      val t0 = System.nanoTime()
      val q = mk(dir).writeStream.format("noop")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .outputMode(mode)
        .start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress
      val inputRows = progs.map(_.numInputRows).sum
      val stateRows = progs.reverseIterator
        .flatMap(p => Option(p.stateOperators))
        .find(_.nonEmpty).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
      q.stop()
      Run(name, tag, inputRows, wall, stateRows, keysOf(dir, kind))
    }

    val runs = mirrors.flatMap { case (name, mode, kind, mk) =>
      Seq(runOne(name, mode, kind, mk, base, "x1"),
        runOne(name, mode, kind, mk, big, "x10"))
    }

    def fx(d: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    val byName = runs.groupBy(_.name)
    var breaches = 0
    val rows = mirrors.map { case (name, _, kind, _) =>
      val Seq(r1, r10) = byName(name).sortBy(_.tag.length) // x1, x10
      val ratio =
        if (r1.statePerKeyPpm > 0) r10.statePerKeyPpm.toDouble / r1.statePerKeyPpm
        else if (r10.statePerKeyPpm == 0) 1.0
        else Double.PositiveInfinity
      val ok = ratio <= 1.5
      if (!ok) breaches += 1
      s""""$name":{"key":"$kind",""" +
        s""""x1":{"input_rows":${r1.inputRows},"wall_s":${fx(r1.wallS)},"rows_per_s":${r1.rowsPerS},"state_rows":${r1.stateRows},"keys":${r1.keys},"state_per_key_ppm":${r1.statePerKeyPpm}},""" +
        s""""x10":{"input_rows":${r10.inputRows},"wall_s":${fx(r10.wallS)},"rows_per_s":${r10.rowsPerS},"state_rows":${r10.stateRows},"keys":${r10.keys},"state_per_key_ppm":${r10.statePerKeyPpm}},""" +
        s""""state_per_key_ratio":${fx(ratio)},"ok":$ok}"""
    }
    val json = s"""{"base":"$base","big":"$big","gate":"state_per_key ratio <= 1.5 at 10x input","breaches":$breaches,"mirrors":{${rows.mkString(",")}}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAMCHECK.json"), json + "\n")
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
    if (breaches > 0) sys.exit(1)
  }
}
