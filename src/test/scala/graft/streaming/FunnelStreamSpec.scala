package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel mirror: under event-time-ordered arrival the stateful
  * fold must equal the batch chained-conditional-min funnel. */
class FunnelStreamSpec extends AnyFunSuite {
  implicit lazy val spark: org.apache.spark.sql.SparkSession =
    graft.Sessions.local("4", "graft-funnel-stream-test")
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("funnelStream equals the batch funnel on in-order arrival, across batches") {
    val events = Seq(
      // user 1: full funnel
      Streams.Event(1L, ts(1000), "view", 1.0),
      Streams.Event(1L, ts(2000), "click", 1.0),
      Streams.Event(1L, ts(3000), "purchase", 1.0),
      // user 2: click before view — click must NOT count; later click does
      Streams.Event(2L, ts(500), "click", 1.0),
      Streams.Event(2L, ts(1500), "view", 1.0),
      Streams.Event(2L, ts(2500), "click", 1.0),
      // user 3: purchase without click — stays stage 1
      Streams.Event(3L, ts(100), "view", 1.0),
      Streams.Event(3L, ts(200), "purchase", 1.0),
      // user 4: simultaneous click (not strictly after) is rejected
      Streams.Event(4L, ts(700), "view", 1.0),
      Streams.Event(4L, ts(700), "click", 1.0),
      // user 5: never views
      Streams.Event(5L, ts(900), "purchase", 1.0))
    val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(5)
    val in = MemoryStream[Streams.Event]
    val q = Streams.funnelStream(in.toDS()).writeStream
      .format("memory").queryName("funnel_out").outputMode(OutputMode.Update()).start()
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    // last emitted row per user is the final funnel state
    val got = spark.sql(
      "SELECT user_id, t_view, t_click, t_purchase, stage FROM funnel_out")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) => u -> rows.last }
    q.stop()
    // sequential reference: the batch semantics (first view, first click
    // strictly after, first purchase strictly after)
    def chain(es: Seq[Streams.Event]): (Option[Long], Option[Long], Option[Long]) = {
      val sorted = es.sortBy(_.ts.getTime)
      val tv = sorted.collectFirst { case e if e.event_type == "view" => e.ts.getTime }
      val tc = tv.flatMap(v => sorted.collectFirst {
        case e if e.event_type == "click" && e.ts.getTime > v => e.ts.getTime })
      val tp = tc.flatMap(c => sorted.collectFirst {
        case e if e.event_type == "purchase" && e.ts.getTime > c => e.ts.getTime })
      (tv, tc, tp)
    }
    events.groupBy(_.user_id).foreach { case (u, es) =>
      val (tv, tc, tp) = chain(es)
      val r = got(u)
      def cell(i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))
      assert(cell(1) === tv, s"user $u t_view")
      assert(cell(2) === tc, s"user $u t_click")
      assert(cell(3) === tp, s"user $u t_purchase")
      val stage = if (tp.nonEmpty) 3 else if (tc.nonEmpty) 2 else if (tv.nonEmpty) 1 else 0
      assert(r.getLong(4) === stage.toLong, s"user $u stage")
    }
  }

  test("lastTouchStream emits one row per purchase crediting the latest " +
    "strictly-preceding touch, across batch boundaries") {
    val events = Seq(
      // user 1: view → purchase → click → purchase (2nd credits the click)
      Streams.Event(1L, ts(1000), "view", 1.0),
      Streams.Event(1L, ts(5000), "purchase", 1.0),
      Streams.Event(1L, ts(7000), "click", 1.0),
      Streams.Event(1L, ts(9000), "purchase", 1.0),
      // user 2: purchase with NO prior touch → null attribution
      Streams.Event(2L, ts(800), "purchase", 1.0),
      // user 3: touch in batch 1, purchase in batch 2 (state crosses)
      Streams.Event(3L, ts(2000), "click", 1.0),
      Streams.Event(3L, ts(8000), "purchase", 1.0),
      // error events never count as touches
      Streams.Event(2L, ts(900), "error", 1.0),
      Streams.Event(2L, ts(1100), "purchase", 1.0))
    val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(5)
    val in = MemoryStream[Streams.Event]
    val q = Streams.lastTouchStream(in.toDS()).writeStream
      .format("memory").queryName("touch_out").outputMode(OutputMode.Append()).start()
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    val got = spark.sql(
      "SELECT user_id, purchase_ts, touch_ts, touch_type, secs_since_touch FROM touch_out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    q.stop()
    assert(got === Set(
      (1L, 5000L, Some(1000L), Some("view"), Some(4L)),
      (1L, 9000L, Some(7000L), Some("click"), Some(2L)),
      (2L, 800L, None, None, None),
      (2L, 1100L, None, None, None),
      (3L, 8000L, Some(2000L), Some("click"), Some(6L))))
  }

  test("transitionsStream emits the batch lead-pair multiset across batch " +
    "boundaries (state carries the last type over)") {
    val events = Seq(
      Streams.Event(1L, ts(1000), "view", 1.0),
      Streams.Event(1L, ts(2000), "click", 1.0),
      Streams.Event(1L, ts(3000), "view", 1.0),   // batch 2 continues from click
      Streams.Event(1L, ts(4000), "purchase", 1.0),
      Streams.Event(2L, ts(1500), "signup", 1.0), // single event → no step
      Streams.Event(3L, ts(500), "view", 1.0),
      Streams.Event(3L, ts(2500), "view", 1.0))   // self-transition counts
    val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(4)
    val in = MemoryStream[Streams.Event]
    val q = Streams.transitionsStream(in.toDS()).writeStream
      .format("memory").queryName("trans_out").outputMode(OutputMode.Append()).start()
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    val got = spark.sql("SELECT user_id, from_type, to_type FROM trans_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    q.stop()
    // batch reference: per user sorted by ts, consecutive pairs
    val expect = events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val s = es.sortBy(_.ts.getTime).map(_.event_type)
      s.zip(s.drop(1)).map { case (f, t) => (u, f, t) }
    }.groupBy(identity).view.mapValues(_.length).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("ewmaStream: final per-user value equals the 8-tap ladder on the last values") {
    val events = Seq(
      Streams.Event(1L, ts(1000), "view", 1.25),
      Streams.Event(1L, ts(2000), "view", 2.50),
      Streams.Event(1L, ts(3000), "view", 4.00),
      Streams.Event(2L, ts(1500), "view", 10.00)) ++
      // user 3: ten events — only the last eight may contribute
      (1 to 10).map(i => Streams.Event(3L, ts(i * 1000L), "view", i.toDouble))
    val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(6)
    val in = MemoryStream[Streams.Event]
    val q = Streams.ewmaStream(in.toDS()).writeStream
      .format("memory").queryName("ewma_out").outputMode(OutputMode.Update()).start()
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    val got = spark.sql("SELECT user_id, ewma FROM ewma_out").collect()
      .groupBy(_.getLong(0)).map { case (u, rows) => u -> rows.last.getDouble(1) }
    q.stop()
    def ladder(vals: Seq[Double]): Double = {
      // vals oldest-first; take last 8, most recent gets weight 128
      val recentFirst = vals.takeRight(8).reverse.map(v => math.round(v * 100.0))
      val ws = recentFirst.indices.map(j => 128L >> j)
      recentFirst.zip(ws).map { case (c, w) => c * w }.sum.toDouble / ws.sum.toDouble / 100.0
    }
    events.groupBy(_.user_id).foreach { case (u, es) =>
      val expect = ladder(es.sortBy(_.ts.getTime).map(_.value))
      assert(math.abs(got(u) - expect) < 1e-12, s"user $u")
    }
  }

  test("anomalyStream equals the batch spike detector across batch boundaries " +
    "(the state ring carries history over)") {
    import spark.implicits._
    val events = Seq(
      // user 1: steady 1.00s, then a 3x spike, then back to normal-ish
      Streams.Event(1L, ts(1000), "view", 1.00),
      Streams.Event(1L, ts(2000), "view", 1.00),
      Streams.Event(1L, ts(3000), "view", 3.00),  // spike vs EWMA(1.00)
      Streams.Event(1L, ts(4000), "view", 1.00),  // 1.00 vs EWMA incl 3.00 — borderline
      // user 2: first event has no history — never flagged
      Streams.Event(2L, ts(500), "view", 99.0),
      Streams.Event(2L, ts(1500), "view", 99.0),
      // user 3: drop-to-near-zero spike (deviation is two-sided)
      Streams.Event(3L, ts(100), "view", 10.0),
      Streams.Event(3L, ts(200), "view", 10.0),
      Streams.Event(3L, ts(300), "view", 0.10))
    val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(4)
    val in = MemoryStream[Streams.Event]
    val q = Streams.anomalyStream(in.toDS()).writeStream
      .format("memory").queryName("spike_out").outputMode(OutputMode.Append()).start()
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    val got = spark.sql("SELECT user_id, t, v, dev_pct FROM spike_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    q.stop()
    // batch reference: the window operator over the same rows, with the
    // streaming t encoding (epoch micros) and a synthetic ordinal id
    val ev4 = events.sortBy(e => (e.user_id, e.ts.getTime)).zipWithIndex
      .map { case (e, i) =>
        (e.user_id, i.toLong, e.ts.getTime * 1000L, math.round(e.value * 100.0)) }
      .toDF("user_id", "event_id", "t", "c")
    val expect = graft.operators.Windows.anomalySpikesOf(ev4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getLong(4))).toSet
    assert(got === expect)
    assert(got.exists(_._1 == 1L) && got.exists(_._1 == 3L)) // both spikes caught
    assert(!got.exists(_._1 == 2L))                          // no-history user silent
  }

  test("drawdownStream's final emission equals the batch ledger across " +
    "batch boundaries (O(1) state: bal/peak/maxdd)") {
    import spark.implicits._
    val events = Seq(
      // user 1: +1000, -300, -300, +100 -> peak 1000, dd 600, final 500
      Streams.Event(1L, ts(1000), "purchase", 10.00),
      Streams.Event(1L, ts(2000), "error", 3.00),
      Streams.Event(1L, ts(3000), "error", 3.00),
      Streams.Event(1L, ts(4000), "signup", 1.00),
      // user 2: debit-first — peak must start at the first balance (-200)
      Streams.Event(2L, ts(500), "error", 2.00),
      Streams.Event(2L, ts(1500), "purchase", 10.00),
      Streams.Event(2L, ts(2500), "error", 5.00),
      // user 3: views only — all neutral
      Streams.Event(3L, ts(100), "view", 9.00),
      Streams.Event(3L, ts(200), "view", 9.00))
    val (b1, b2) = events.sortBy(_.ts.getTime).splitAt(4)
    val in = MemoryStream[Streams.Event]
    val q = Streams.drawdownStream(in.toDS()).writeStream
      .format("memory").queryName("dd_out").outputMode(OutputMode.Append()).start()
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    // the LAST emission per user (highest n_events) is the final summary
    val got = spark.sql("SELECT * FROM dd_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    q.stop()
    val batchDf = events.zipWithIndex.map { case (e, i) =>
      (i.toLong, e.ts, e.user_id, e.event_type, e.value) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val expect = graft.operators.Windows.maxDrawdownOf(batchDf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("final_cents"),
          r.getAs[Long]("max_peak_cents"), r.getAs[Long]("max_drawdown_cents"))).toMap
    expect.foreach { case (u, (n, fin, peak, dd)) =>
      val g = got(u)
      assert((g._2, g._3, g._4, g._5) === ((n, fin, peak, dd)), s"user $u")
    }
    // user 2 balances: -200, 800, 300 -> peak 800 (started at -200, not 0)
    assert(got(2L)._4 === 800L)
    assert(got(2L)._5 === 500L)
  }

  test("topkStream is exact (err=0) while distinct items fit the sketch, " +
    "across batch boundaries") {
    import spark.implicits._
    val events = Seq(
      Streams.Event(1L, ts(1000), "view", 0.0), Streams.Event(1L, ts(2000), "view", 0.0),
      Streams.Event(2L, ts(3000), "view", 0.0), Streams.Event(1L, ts(4000), "view", 0.0),
      Streams.Event(3L, ts(5000), "click", 0.0), Streams.Event(3L, ts(6000), "click", 0.0),
      Streams.Event(2L, ts(7000), "view", 0.0))
    val (b1, b2) = events.splitAt(4)
    val in = MemoryStream[Streams.Event]
    val q = Streams.topkStream(in.toDS(), m = 8).writeStream
      .format("memory").queryName("ss_out").outputMode(OutputMode.Append()).start()
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM ss_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    q.stop()
    // the LAST emission per (key, item) = highest est
    val fin = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.maxBy(_._3)).values.toSet
    assert(fin === Set(("view", 1L, 3L, 0L), ("view", 2L, 2L, 0L),
      ("click", 3L, 2L, 0L)))
  }

  test("topkStream eviction keeps SpaceSaving bounds (est >= true >= est - err)") {
    import spark.implicits._
    // key "view", m=2: a,a,a then b then c -> c evicts b: est 2, err 1
    val events = Seq(
      Streams.Event(10L, ts(1000), "view", 0.0), Streams.Event(10L, ts(2000), "view", 0.0),
      Streams.Event(10L, ts(3000), "view", 0.0), Streams.Event(20L, ts(4000), "view", 0.0),
      Streams.Event(30L, ts(5000), "view", 0.0))
    val in = MemoryStream[Streams.Event]
    val q = Streams.topkStream(in.toDS(), m = 2).writeStream
      .format("memory").queryName("ss_ev").outputMode(OutputMode.Append()).start()
    in.addData(events); q.processAllAvailable()
    val fin = spark.sql("SELECT * FROM ss_ev").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    q.stop()
    assert(fin === Set((10L, 3L, 0L), (30L, 2L, 1L)))
    // bounds: item 30 true count 1; est 2 >= 1 >= est - err = 1
  }
}
