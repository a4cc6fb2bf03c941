package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CorpusOps

/** Hand-built cases for the batch-9 operator additions: max drawdown,
  * seasonal baseline residuals, exact rank-sum AUC, PMI co-occurrence
  * lift, triplet hard-example mining, and MMR diversified re-ranking.
  * The DuckDB oracle gate proves each on the synthetic corpus; these pin
  * the core rules on inputs small enough to check by hand. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-round9-test")

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, String, Long, String, Double)]) = {
    import spark.implicits._
    rows.map { case (eid, t, uid, typ, v) => (eid, ts(t), uid, typ, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("maxDrawdownOf: peak-to-trough fall on a hand ledger") {
    // user 1: +1000 (purchase), -300 (error), -300 (error), +100 (signup)
    // balance: 1000, 700, 400, 500 -> peak 1000, max drawdown 600
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 10.00),
      (2L, "2024-01-01 01:00:00", 1L, "error", 3.00),
      (3L, "2024-01-01 02:00:00", 1L, "error", 3.00),
      (4L, "2024-01-01 03:00:00", 1L, "signup", 1.00)))
    val r = Windows.maxDrawdownOf(df).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("max_peak_cents") === 1000L)
    assert(r(0).getAs[Long]("max_drawdown_cents") === 600L)
    assert(r(0).getAs[Long]("final_cents") === 500L)
  }

  test("maxDrawdownOf: views are neutral and a rising curve has zero drawdown") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 2L, "purchase", 5.00),
      (2L, "2024-01-01 01:00:00", 2L, "view", 99.99), // neutral
      (3L, "2024-01-01 02:00:00", 2L, "purchase", 5.00)))
    val r = Windows.maxDrawdownOf(df).collect()
    assert(r(0).getAs[Long]("max_drawdown_cents") === 0L)
    assert(r(0).getAs[Long]("final_cents") === 1000L)
  }

  test("maxDrawdownOf: drawdown measures from the running peak, not the start") {
    // balance path: -200 (error), +1000, -500: peak 800, trough 300 -> dd 500
    // (a from-start measure would report 200)
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 3L, "error", 2.00),
      (2L, "2024-01-01 01:00:00", 3L, "purchase", 10.00),
      (3L, "2024-01-01 02:00:00", 3L, "error", 5.00)))
    val r = Windows.maxDrawdownOf(df).collect()
    assert(r(0).getAs[Long]("max_drawdown_cents") === 500L)
    assert(r(0).getAs[Long]("max_peak_cents") === 800L)
  }

  test("seasonalBaselineOf: residual is slot minus floored same-hour mean") {
    // hour 5 on three days: 100, 200, 400 cents -> baseline (700 div 3)=233
    val df = eventsDf(Seq(
      (1L, "2024-01-01 05:00:00", 1L, "view", 1.00),
      (2L, "2024-01-02 05:00:00", 1L, "view", 2.00),
      (3L, "2024-01-03 05:00:00", 1L, "view", 4.00)))
    val r = Windows.seasonalBaselineOf(df).collect()
    assert(r.forall(_.getAs[Long]("baseline_cents") === 233L))
    val res = r.map(x => (x.getAs[java.sql.Date]("d").toString,
      x.getAs[Long]("residual_cents"))).toMap
    assert(res === Map("2024-01-01" -> -133L, "2024-01-02" -> -33L,
      "2024-01-03" -> 167L))
  }

  test("seasonalBaselineOf: hours are independent baselines") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 05:00:00", 1L, "view", 1.00),
      (2L, "2024-01-01 06:00:00", 1L, "view", 9.00)))
    val r = Windows.seasonalBaselineOf(df).collect()
    // each hour's single slot IS its baseline -> residual 0 for both
    assert(r.forall(_.getAs[Long]("residual_cents") === 0L))
  }

  private def docsDf(rows: Seq[(Long, String, String, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("aucRankOf: perfect separation gives AUC 1, reversed gives 0") {
    // en docs strictly longer than others -> AUC = 1.0 (1e6 ppm)
    val perfect = docsDf(Seq(
      (1L, "a", "en", "web", 100L), (2L, "a", "en", "web", 90L),
      (3L, "a", "fr", "web", 10L), (4L, "a", "de", "web", 20L)))
    val p = Aggregations.aucRankOf(perfect).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("auc_ppm")).toMap
    assert(p("ALL") === 1000000L && p("web") === 1000000L)
    val reversed = docsDf(Seq(
      (1L, "a", "en", "web", 5L), (2L, "a", "fr", "web", 50L)))
    val q = Aggregations.aucRankOf(reversed).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("auc_ppm")).toMap
    assert(q("ALL") === 0L)
  }

  test("aucRankOf: ties contribute half — all-equal scores give AUC 1/2") {
    val tied = docsDf(Seq(
      (1L, "a", "en", "web", 42L), (2L, "a", "fr", "web", 42L),
      (3L, "a", "en", "web", 42L), (4L, "a", "de", "web", 42L)))
    val t = Aggregations.aucRankOf(tied).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("auc_ppm")).toMap
    assert(t("ALL") === 500000L)
  }

  test("aucRankOf: single-class groups emit NULL auc rather than divide") {
    val oneClass = docsDf(Seq(
      (1L, "a", "en", "web", 1L), (2L, "a", "en", "web", 2L)))
    val r = Aggregations.aucRankOf(oneClass).collect()
    assert(r.forall(_.isNullAt(3)))
  }

  test("pmiCooccurOf: always-together pair lifts above independents") {
    // 'x y' always co-occur (4 docs); 'p q' co-occur once in 4
    val docs = docsDf(Seq(
      (1L, "x y p", "en", "w", 0L), (2L, "x y q", "en", "w", 0L),
      (3L, "x y p q", "en", "w", 0L), (4L, "x y", "en", "w", 0L)))
    val r = CorpusOps.pmiCooccurOf(docs, vocabK = 10, k = 10).collect()
    val lift = r.map(x => ((x.getString(0), x.getString(1)),
      x.getAs[Long]("lift_ppm"))).toMap
    // x,y: 4*4*1e6/(4*4) = 1e6 (independence at saturation)
    assert(lift(("x", "y")) === 1000000L)
    // p,q: n_ab=1, n_p=2, n_q=2 -> 1*4*1e6/4 = 1e6; x,p: 2*4/(4*2)=1e6... use
    // a rarer pair: p appears in docs 1,3; q in 2,3; together only doc 3
    assert(lift(("p", "q")) === 1000000L)
    // all pairs here sit at independence; ordering falls to the tie-break
    assert(r.map(_.getAs[Long]("lift_ppm")).forall(_ === 1000000L))
  }

  test("pmiCooccurOf: a genuinely associated pair outranks independence") {
    // 'a b' always together (3 docs of 6); 'c' spread independently
    val docs = docsDf(Seq(
      (1L, "a b", "en", "w", 0L), (2L, "a b c", "en", "w", 0L),
      (3L, "a b", "en", "w", 0L), (4L, "c d", "en", "w", 0L),
      (5L, "d e", "en", "w", 0L), (6L, "c e", "en", "w", 0L)))
    val r = CorpusOps.pmiCooccurOf(docs, vocabK = 10, k = 10).collect()
    val byPair = r.map(x => ((x.getString(0), x.getString(1)),
      x.getAs[Long]("lift_ppm"))).toMap
    // a,b: 3*6e6/(3*3) = 2e6 — twice independence; tops the ranking
    assert(byPair(("a", "b")) === 2000000L)
    assert(r.head.getString(0) === "a" && r.head.getString(1) === "b")
  }

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def embDf(rows: Seq[(Long, Seq[Float], Int)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, e, l) => Row(id, e, l) }),
      embSchema)

  test("tripletMiningOf: picks the closest impostor and farthest same-label") {
    // anchor 0 (label 1) at (1,0); same-label 1 at (1, 0.1), 2 at (0.5, 0.8);
    // other-label 3 at (0.9, 0.1), 4 at (0, 1)
    val e = embDf(Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(1f, 0.1f), 1), (2L, Seq(0.5f, 0.8f), 1),
      (3L, Seq(0.9f, 0.1f), 2), (4L, Seq(0f, 1f), 2)))
    val r = Similarity.tripletMiningOf(e, probeBound = 1L).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("hard_pos_id") === 2L)  // farthest same-label
    assert(r(0).getAs[Long]("hard_neg_id") === 3L)  // closest impostor
    // neg (3) is closer to the anchor than pos (2): a violated triplet
    assert(r(0).getAs[Boolean]("violation"))
  }

  test("tripletMiningOf: margin-satisfied anchors report violation=false") {
    val e = embDf(Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(0.9f, 0.1f), 1), // tight positive
      (2L, Seq(0f, 1f), 2)))                          // orthogonal negative
    val r = Similarity.tripletMiningOf(e, probeBound = 1L).collect()
    assert(r(0).getAs[Long]("hard_pos_id") === 1L)
    assert(r(0).getAs[Long]("hard_neg_id") === 2L)
    assert(!r(0).getAs[Boolean]("violation"))
  }

  test("mmrRerankOf: diversity term demotes a near-duplicate of the first pick") {
    // query 0 at (1,0). Candidates: 1 at (0.8,0.6) rel=0.8; 2 a near-copy
    // of 1 (rel~0.79, sim to 1 ~ 1); 3 at (0.6,-0.8), rel=0.6 but
    // ORTHOGONAL to pick 1 (sim=0). Pure relevance ranks 1,2,3; MMR step 2
    // scores 2 at 0.7*0.79-0.3*1 ~ 0.25 vs 3 at 0.7*0.6-0 = 0.42 -> 1,3,2.
    val e = embDf(Seq(
      (0L, Seq(1f, 0f), 1),
      (1L, Seq(0.8f, 0.6f), 1), (2L, Seq(0.79f, 0.61f), 1),
      (3L, Seq(0.6f, -0.8f), 1)))
    val r = Similarity.mmrRerankOf(spark, e, poolK = 3, k = 3).collect()
    assert(r.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 3L, 2L))
  }

  test("ksTestOf: disjoint supports give D=1e6 at the lower sample's max") {
    // purchases at 1.00/2.00, clicks at 5.00/6.00 -> full separation;
    // sup attained first at cents=200 (all purchases seen, no clicks)
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 1.00),
      (2L, "2024-01-01 01:00:00", 1L, "purchase", 2.00),
      (3L, "2024-01-01 02:00:00", 2L, "click", 5.00),
      (4L, "2024-01-01 03:00:00", 2L, "click", 6.00)))
    val r = Aggregations.ksTestOf(df).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("d_ppm") === 1000000L)
    assert(r(0).getAs[Long]("at_cents") === 200L)
  }

  test("ksTestOf: identical distributions give D=0") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 3.00),
      (2L, "2024-01-01 01:00:00", 1L, "click", 3.00),
      (3L, "2024-01-01 02:00:00", 2L, "purchase", 7.00),
      (4L, "2024-01-01 03:00:00", 2L, "click", 7.00)))
    val r = Aggregations.ksTestOf(df).collect()
    assert(r(0).getAs[Long]("d_ppm") === 0L)
  }

  test("ksTestOf: other event types are excluded from both samples") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 1.00),
      (2L, "2024-01-01 01:00:00", 1L, "click", 1.00),
      (3L, "2024-01-01 02:00:00", 2L, "view", 999.00))) // ignored
    val r = Aggregations.ksTestOf(df).collect()
    assert(r(0).getAs[Long]("n_purchase") === 1L)
    assert(r(0).getAs[Long]("n_click") === 1L)
    assert(r(0).getAs[Long]("d_ppm") === 0L)
  }

  test("cohensKappa on testdata: bounded by po and consistent with its parts") {
    val r = graft.functions.TextAnalysis.cohensKappa(spark, "/root/testdata/sf0.001")
      .collect()
    assert(r.length === 1)
    val (n, agree) = (r(0).getAs[Long]("n_docs"), r(0).getAs[Long]("n_agree"))
    val (po, pe, k) = (r(0).getAs[Long]("po_ppm"), r(0).getAs[Long]("pe_ppm"),
      r(0).getAs[Long]("kappa_ppm"))
    assert(n > 0 && agree <= n)
    assert(po === agree * 1000000L / n)
    // kappa <= po (chance correction can only subtract) and >= -1e6
    assert(k <= po && k >= -1000000L)
    assert(pe >= 0L && pe <= 1000000L)
  }

  test("autocorrDailyOf: alternating series gives r=-1 at lag 1 and r=+1 at lag 2") {
    // one event per day, values 1,2,1,2,1,2: lag-1 pairs are perfectly
    // anti-linear (y = 3 - x), lag-2 pairs identical (y = x)
    val df = eventsDf((1 to 6).map(i =>
      (i.toLong, f"2024-01-0$i 12:00:00", 1L, "view",
        if (i % 2 == 1) 1.00 else 2.00)))
    val r = Windows.autocorrDailyOf(df).collect()
      .map(x => x.getAs[Long]("lag") -> x.getAs[Double]("autocorr")).toMap
    assert(math.abs(r(1L) - (-1.0)) < 1e-9)
    assert(math.abs(r(2L) - 1.0) < 1e-9)
  }

  test("autocorrDailyOf: constant series drops out (zero variance, no NaN rows)") {
    val df = eventsDf((1 to 5).map(i =>
      (i.toLong, f"2024-01-0$i 12:00:00", 1L, "view", 7.00)))
    assert(Windows.autocorrDailyOf(df).collect().isEmpty)
  }

  test("kmeansInertia on testdata: cohesion is non-decreasing over Lloyd iterations") {
    val rows = Similarity.kmeansInertia(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getAs[Long]("iters"))
    assert(rows.length === 3)
    val sums = rows.map(_.getAs[Long]("sum_cos_ppm"))
    assert(sums(1) >= sums(0) && sums(2) >= sums(1),
      s"cohesion regressed: ${sums.toSeq}")
    assert(rows.forall(_.getAs[Long]("n_vecs") === rows(0).getAs[Long]("n_vecs")))
  }

  test("epochShuffle: epochs conserve totals but recompose batches") {
    val r = graft.functions.TextAnalysis.epochShuffle(spark, "/root/testdata/sf0.001")
      .collect()
    val byEpoch = r.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet === Set(0L, 1L))
    // totals identical per epoch (same corpus, different arrangement)
    val totals = byEpoch.view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(totals(0L) === totals(1L))
    // at least one batch has a different size or id-range across epochs
    def key(e: Long) = byEpoch(e).map(x => (x.getAs[Long]("batch"),
      x.getAs[Long]("n_docs"), x.getAs[Long]("min_doc"), x.getAs[Long]("max_doc"))).toSet
    assert(key(0L) !== key(1L), "epoch 1 produced the identical batch composition")
  }

  test("timeToConvertOf: exact dictionary percentiles on 1..10 second latencies") {
    // 10 users, user i views at t0 and purchases i seconds later
    val rows = (1 to 10).flatMap { i =>
      Seq((i * 2L, "2024-01-01 00:00:00", i.toLong, "view", 1.0),
        (i * 2 + 1L, s"2024-01-01 00:00:${"%02d".format(i)}", i.toLong, "purchase", 1.0))
    }
    val r = Windows.timeToConvertOf(eventsDf(rows)).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_converted") === 10L)
    assert(r(0).getAs[Long]("p50_s") === 5L)  // cum>=ceil(10*0.5)=5 -> lat 5
    assert(r(0).getAs[Long]("p90_s") === 9L)
    assert(r(0).getAs[Long]("max_s") === 10L)
  }

  test("timeToConvertOf: purchases at-or-before the first view never convert") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 05:00:00", 1L, "purchase", 1.0), // before first view
      (2L, "2024-01-01 06:00:00", 1L, "view", 1.0),
      (3L, "2024-01-02 00:00:00", 2L, "view", 1.0),
      (4L, "2024-01-02 00:00:30", 2L, "purchase", 1.0)))
    val r = Windows.timeToConvertOf(df).collect()
    assert(r(0).getAs[Long]("n_converted") === 1L)
    assert(r(0).getAs[Long]("max_s") === 30L)
  }

  test("recallCurve on testdata: hits nest and never exceed the budget") {
    val rows = Similarity.recallCurve(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(1L, 5L, 10L, 20L))
    val hits = rows.map(_.getAs[Long]("n_hits"))
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"hit sets must nest: ${hits.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_queries") * r.getAs[Long]("k"))
      assert(r.getAs[Long]("recall_ppm") <= 1000000L)
    }
  }

  test("oodRate on testdata: label partition covers the corpus, rates in range") {
    val dirSf = "/root/testdata/sf0.001"
    val rows = Similarity.oodRate(spark, dirSf).collect()
    val total = graft.sources.Tables.embeddings(spark, dirSf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === total)
    rows.foreach { r =>
      val (n, ood, ppm) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_ood"),
        r.getAs[Long]("ood_ppm"))
      assert(ood >= 0L && ood <= n)
      assert(ppm === ood * 1000000L / n)
    }
  }

  test("memorizationRate on testdata: rates are valid ppm and grams counted") {
    val rows = graft.functions.TextAnalysis.memorizationRate(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_grams") > 0L)
      assert(r.getAs[Long]("n_memorized") <= r.getAs[Long]("n_grams"))
      val ppm = r.getAs[Long]("memorized_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }

  test("audienceOverlapOf: exact Jaccard on a hand overlap") {
    // u1 {click,view}, u2 {view}, u3 {click,view}: both=2, union=3
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:01:00", 1L, "view", 1.0),
      (3L, "2024-01-01 00:02:00", 2L, "view", 1.0),
      (4L, "2024-01-01 00:03:00", 3L, "click", 1.0),
      (5L, "2024-01-01 00:04:00", 3L, "view", 1.0),
      (6L, "2024-01-01 00:05:00", 3L, "view", 1.0))) // dup event, same set
    val r = Aggregations.audienceOverlapOf(df).collect()
    assert(r.length === 1)
    assert(r(0).getAs[String]("type_a") === "click")
    assert(r(0).getAs[String]("type_b") === "view")
    assert(r(0).getAs[Long]("n_both") === 2L)
    assert(r(0).getAs[Long]("n_a") === 2L && r(0).getAs[Long]("n_b") === 3L)
    assert(r(0).getAs[Long]("jaccard_ppm") === 2000000L / 3L)
  }

  test("targetEncode on testdata: shrinkage lands between raw and global mean") {
    val rows = Aggregations.targetEncode(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, g, enc) = (r.getAs[Long]("raw_mean_cents"),
        r.getAs[Long]("g_mean_cents"), r.getAs[Long]("encoded_cents"))
      // encoded is a convex mix of raw and global (±1 cent floor slack)
      assert(enc >= math.min(raw, g) - 1 && enc <= math.max(raw, g) + 1,
        s"enc $enc outside [$raw, $g]")
      assert(math.abs(enc - g) <= math.abs(raw - g) + 1)
    }
  }

  test("pairCurationOf: dispositions partition the pairs; short text fails first") {
    import spark.implicits._
    // doc 10/11: identical long good text (sha dup candidates);
    // doc 12: 3 tokens -> text_fail regardless of its image hash
    val good = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, good, "en", "w", 0L), (11L, good, "en", "w", 0L),
      (12L, "too short text", "en", "w", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Multimodal.pairCurationOf(docs).collect()
    assert(r.length === 1)
    val row = r(0)
    val parts = Seq("n_text_fail", "n_image_fail", "n_dup", "n_kept")
      .map(row.getAs[Long](_))
    assert(parts.sum === row.getAs[Long]("n_pairs") && row.getAs[Long]("n_pairs") === 3L)
    assert(row.getAs[Long]("n_text_fail") === 1L)
    // the twin good docs land together: both pass image (then 1 kept +
    // 1 dup) or both fail it (2 image_fail) — never split
    assert((row.getAs[Long]("n_kept") === 1L && row.getAs[Long]("n_dup") === 1L)
      || row.getAs[Long]("n_image_fail") === 2L)
  }

  test("survivalCurveOf: step decay at the observed spans") {
    // spans: u1 = 0 days, u2 = 5 days, u3 = 14 days
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 00:00:00", 2L, "view", 1.0),
      (3L, "2024-01-06 00:00:00", 2L, "view", 1.0),
      (4L, "2024-01-01 00:00:00", 3L, "view", 1.0),
      (5L, "2024-01-15 00:00:00", 3L, "view", 1.0)))
    val r = Windows.survivalCurveOf(df).collect()
      .map(x => x.getAs[Long]("k") -> x.getAs[Long]("n_surviving")).toMap
    assert(r(0L) === 3L)
    assert((1L to 5L).forall(r(_) === 2L))
    assert((6L to 14L).forall(r(_) === 1L))
  }

  test("winsorizeOf: one outlier moves the raw mean, not the winsorized one") {
    import spark.implicits._
    val vals = ((1L to 99L) :+ 10000L).toDF("cents")
    val r = Aggregations.winsorizeOf(vals).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("p01_cents") === 1L)
    assert(r(0).getAs[Long]("p99_cents") === 99L)
    assert(r(0).getAs[Long]("mean_cents") === 149L)       // (4950+10000)/100
    assert(r(0).getAs[Long]("winsorized_mean_cents") === 50L) // (4950+99)/100
  }

  test("clusterTopics on testdata: ranked 1..3 per cell, score matches ratio") {
    val rows = Similarity.clusterTopics(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cell")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ===
        (1L to rs.length).toSeq)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("score_ppm") ===
        r.getAs[Long]("tf") * 1000000L / r.getAs[Long]("n_cells_with"))
    }
  }

  test("pathTopKOf: prefix order and full-history conversion") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 00:01:00", 1L, "click", 1.0),
      (3L, "2024-01-01 00:00:00", 2L, "view", 1.0),
      (4L, "2024-01-01 00:01:00", 2L, "click", 1.0),
      (5L, "2024-01-01 00:00:00", 3L, "view", 1.0),
      (6L, "2024-01-01 00:01:00", 3L, "purchase", 1.0)))
    val r = Windows.pathTopKOf(df).collect()
      .map(x => x.getAs[String]("path") ->
        (x.getAs[Long]("n_users"), x.getAs[Long]("n_converted"))).toMap
    assert(r("view>click") === ((2L, 0L)))
    assert(r("view>purchase") === ((1L, 1L)))
  }

  test("pathTopKOf: prefix truncates at 6 but conversion still sees event 7") {
    val rows = (1 to 7).map(i =>
      (i.toLong, s"2024-01-01 00:0$i:00", 1L, if (i == 7) "purchase" else "view", 1.0))
    val r = Windows.pathTopKOf(eventsDf(rows)).collect()
    assert(r.length === 1)
    assert(r(0).getAs[String]("path") === Seq.fill(6)("view").mkString(">"))
    assert(r(0).getAs[Long]("n_converted") === 1L) // purchase was event 7
  }

  test("peakDetectionOf: strict interior maxima only") {
    // daily totals 100, 300, 200, 200: day 2 is the only peak (day 3
    // fails the strict > next test against day 4's equal value? no -
    // 200 > 200 is false, and day 4 is a boundary)
    val df = eventsDf(Seq(
      (1L, "2024-01-01 12:00:00", 1L, "view", 1.00),
      (2L, "2024-01-02 12:00:00", 1L, "view", 3.00),
      (3L, "2024-01-03 12:00:00", 1L, "view", 2.00),
      (4L, "2024-01-04 12:00:00", 1L, "view", 2.00)))
    val r = Windows.peakDetectionOf(df).collect()
    assert(r.length === 1)
    assert(r(0).getAs[java.sql.Date]("d").toString === "2024-01-02")
    assert(r(0).getAs[Long]("peak_cents") === 300L)
    assert(r(0).getAs[Long]("prev_cents") === 100L)
    assert(r(0).getAs[Long]("next_cents") === 200L)
  }

  test("allocBudget on testdata: allocations sum exactly to the budget") {
    val rows = Aggregations.allocBudget(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[Long]("alloc_units")).sum === 1000000L)
    rows.foreach { r =>
      val d = r.getAs[Long]("alloc_units") - r.getAs[Long]("fl")
      assert(d === 0L || d === 1L)
    }
  }

  test("dedupBiasAuditOf: cohorts split on the canonical flag") {
    import spark.implicits._
    val docs = Seq((1L, "a", "en", "w", 100L), (2L, "a", "en", "w", 40L),
      (3L, "b", "en", "w", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val groups = Seq((1L, 1L, 2L, true), (2L, 1L, 2L, false), (3L, 3L, 1L, true))
      .toDF("doc_id", "group_id", "group_size", "is_canonical")
    val r = Dedup.dedupBiasAuditOf(docs, groups).collect()
      .map(x => x.getAs[String]("cohort") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("mean_chars"))).toMap
    assert(r("kept") === ((2L, 55L)))    // (100+10)/2
    assert(r("dropped") === ((1L, 40L)))
  }

  test("annFiltered: every neighbor carries the query's label (pre-filter)") {
    val dirSf = "/root/testdata/sf0.001"
    val labels = graft.sources.Tables.embeddings(spark, dirSf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.annFiltered(spark, dirSf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, v) = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      assert(labels(v) === labels(q), s"neighbor $v label differs from query $q")
      assert(v !== q)
    }
    // ranks are 1..k per query (rnk is the Int posexplode ordinal)
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq === (1 to rs.length).toSeq)
    }
  }

  test("heldoutPpl on testdata: train scores above heldout under its own model") {
    val r = graft.functions.CorpusOps.heldoutPpl(spark, "/root/testdata/sf0.01")
      .collect().map(x => x.getAs[String]("split") -> x.getAs[Long]("mean_ppm")).toMap
    assert(r.keySet === Set("train", "val", "test"))
    // the model memorizes its own split: train mean must be the max
    assert(r("train") >= r("val") && r("train") >= r("test"),
      s"train ${r("train")} should dominate heldout ${r("val")}/${r("test")}")
  }

  test("mmrRerankOf: rank 1 is the pure-relevance argmax with score 0.7*rel") {
    val e = embDf(Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(1f, 0.2f), 1), (2L, Seq(0f, 1f), 1)))
    val r = Similarity.mmrRerankOf(spark, e, poolK = 2, k = 2).collect()
    assert(r(0).getAs[Long]("vec_id") === 1L)
    assert(math.abs(r(0).getAs[Double]("mmr_score")
      - 0.7 * r(0).getAs[Double]("rel")) < 1e-12)
  }
}
