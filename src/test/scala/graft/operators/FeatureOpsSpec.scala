package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 feature operators: EWMA (sequential-reference differential),
  * fuzzy blocking ER join (brute-force differential + plan contract),
  * tokenizer encoding (vocab-rank consistency), HLL sketch-merge gate. */
class FeatureOpsSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-featureops-test")
  private val dir = "/root/testdata/sf0.001"

  test("rel_skyline_pareto matches the quadratic dominance test; equal " +
    "points co-survive") {
    val per = graft.sources.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = per.filter { case (_, n, s) =>
      !per.exists { case (_, n2, s2) =>
        n2 >= n && s2 >= s && (n2 > n || s2 > s)
      }
    }.map(_._1).toSet
    val got = Relational.skylineCustomers(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(got.nonEmpty)
    assert(got === brute)
  }

  test("sim_pq_topk: every vector carries exactly 4 codes in [1,16] and the " +
    "ADC scores reconstruct from the code + lookup tables") {
    // reconstruct one query's scores from first principles on collected data
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector
        .map(f => math.round(f.toDouble * 1000.0))).toMap
    val sl = vecs.head._2.length / 4
    def sub(v: Vector[Long], m: Int) = v.slice(m * sl, (m + 1) * sl)
    val cb = (1L to 16L).map(c => c -> vecs(c)).toMap
    def codeOf(v: Vector[Long], m: Int): Long =
      (1L to 16L).minBy(c => {
        val d = sub(v, m).zip(sub(cb(c), m)).map { case (x, y) => (x - y) * (x - y) }.sum
        (d, c)
      })
    def adcScore(q: Vector[Long], v: Vector[Long]): Long =
      (0 until 4).map { m =>
        val c = codeOf(v, m)
        sub(q, m).zip(sub(cb(c), m)).map { case (x, y) => x * y }.sum
      }.sum
    val got = Similarity.pqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got.nonEmpty)
    got.foreach { case ((q, v), score) =>
      assert(score === adcScore(vecs(q), vecs(v)), s"q=$q v=$v")
    }
  }

  test("sim_pq_recall: compressed search recalls a sane fraction of the " +
    "exact answer (> 0, <= 1)") {
    val r = Similarity.pqRecall(spark, dir).collect().head
    val recall = r.getDouble(2)
    assert(recall > 0.0 && recall <= 1.0, s"recall $recall")
  }

  test("sim_knn_classify: the vote over the (separately oracle-gated) " +
    "neighbor lists matches a sequential recount") {
    val nbrs = Similarity.annMultiQueryTopK(spark, dir, 20L, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))) // (q_id, neighbor vec_id)
    val labels = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = nbrs.groupBy(_._1).map { case (q, ns) =>
      val votes = ns.map(n => labels(n._2)).groupBy(identity)
        .map { case (l, vs) => (l, vs.size.toLong) }.toSeq
        .sortBy { case (l, n) => (-n, l) }
      q -> (votes.head._1, votes.head._2, labels(q))
    }
    val got = Similarity.knnClassify(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getInt(3))).toMap
    assert(got.nonEmpty)
    assert(got === expect)
    got.foreach { case (_, (pred, _, truth)) =>
      assert(Set(pred, truth).subsetOf(labels.values.toSet))
    }
  }

  test("win_period_over_period: deltas telescope to last-minus-first and " +
    "ppm signs follow deltas") {
    val rows = Windows.periodOverPeriod(spark, dir).collect()
      .map(r => (r.getDate(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(rows.length > 2)
    assert(rows.head._3 === None) // first day has no prior period
    val deltas = rows.flatMap(_._4)
    assert(deltas.sum === rows.last._2 - rows.head._2) // telescoping
    rows.foreach { case (_, _, prev, delta, ppm) =>
      (delta, ppm) match {
        case (Some(d), Some(p)) =>
          assert(math.signum(d.toDouble) == math.signum(p.toDouble) || p == 0L)
          assert(prev.exists(_ > 0))
        case _ => ()
      }
    }
  }

  test("agg_equiwidth_hist: buckets partition all rows and every bucket's " +
    "observed range maps back to its own bucket id") {
    val rows = Aggregations.equiwidthHist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = graft.sources.Tables.events(spark, dir).count()
    assert(rows.map(_._2).sum === total)
    val globalMax = rows.map(_._4).max
    rows.foreach { case (b, _, mn, mx) =>
      assert(b >= 0L && b <= 19L)
      assert(mn * 20 / (globalMax + 1) === b, s"bucket $b min $mn")
      assert(mx * 20 / (globalMax + 1) === b, s"bucket $b max $mx")
    }
    assert(rows.exists(_._1 == 19L)) // the max value lands in the last bucket
  }

  test("sim_centroid_labels matches the sequential milli-quantized mean") {
    val got = Similarity.centroidPerLabel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toVector)
    def q(f: Float): Long = { // Spark round(): half away from zero
      val d = f.toDouble * 1000.0
      if (d < 0) -math.floor(-d + 0.5).toLong else math.floor(d + 0.5).toLong
    }
    val expect = vecs.groupBy(_._1).flatMap { case (lbl, vs) =>
      val dims = vs.head._2.length
      (0 until dims).map { i =>
        val sum = vs.map(v => q(v._2(i))).sum
        (lbl, i.toLong) -> (vs.size.toLong, sum, sum / vs.size) // Long / truncates
      }
    }
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("win_time_weighted_avg matches the sequential step integral") {
    val got = Windows.timeWeightedAvg(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = rows.groupBy(_._1).flatMap { case (u, es) =>
      val s = es.sortBy(e => (e._3, e._2))
      val steps = s.zip(s.drop(1)).map { case ((_, _, t0, c), (_, _, t1, _)) =>
        (c, (t1 - t0) / 1000000L)
      }
      val span = steps.map(_._2).sum
      if (span > 0)
        Some(u -> (steps.size.toLong, span,
          steps.map { case (c, d) => c * d }.sum,
          steps.map { case (c, d) => c * d }.sum / span))
      else None
    }
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("win_ewma matches a sequential per-user reference on the 8-tap ladder") {
    val got = Windows.ewmaPerUser(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("ewma")).toMap
    // sequential reference: per user, sorted by (t, event_id), integer ladder
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("t"),
        round(col("value") * 100).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      sorted.zipWithIndex.foreach { case ((u, e, _, _), i) =>
        val taps = (0 to 7).flatMap { j =>
          if (i - j >= 0) Some((128L >> j, sorted(i - j)._4)) else None
        }
        val expect = taps.map { case (w, c) => w * c }.sum.toDouble /
          taps.map(_._1).sum.toDouble / 100.0
        assert(math.abs(got((u, e)) - expect) < 1e-12, s"ewma drift user=$u ev=$e")
      }
    }
  }

  test("rel_fuzzy_blocking_join matches the brute-force dictionary quadratic") {
    val got = Relational.fuzzyBlockingJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val dict = graft.sources.Tables.part(spark, dir)
      .select(lower(col("p_name")).as("nm")).collect().map(_.getString(0))
      .groupBy(identity).keys.toSeq
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // brute force WITHOUT blocking, then keep only same-noun pairs — the
    // blocked operator must find exactly the same-block matches
    val brute = (for {
      a <- dict; b <- dict if a < b
      if a.split(" ").last == b.split(" ").last
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("fuzzy blocking join plan has no cartesian product") {
    val plan = Relational.fuzzyBlockingJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ta_tokenize_ids: head ids agree with the fitted vocab ranks") {
    val enc = graft.functions.TextAnalysis.tokenizeIds(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // re-derive the vocab rank map sequentially
    val toks = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ts")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty))
    val rank = toks.flatMap(_._2).groupBy(identity).map { case (t, o) => (t, o.size) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(500).zipWithIndex
      .map { case ((t, _), i) => t -> (i + 1) }.toMap
    toks.foreach { case (doc, ts) =>
      val (n, oov, head) = enc(doc)
      assert(n === ts.length.toLong)
      assert(oov === ts.count(t => !rank.contains(t)).toLong)
      val expect = ts.take(16).map(t => rank.getOrElse(t, 0)).mkString("-")
      assert(head === expect, s"doc $doc")
    }
  }

  test("dd_containment: an embedded excerpt scores containment 1.0 on the small side") {
    import spark.implicits._
    // doc 2 is a verbatim slice of doc 1 -> containment_b must be 1.0
    // while Jaccard stays low; doc 3 shares nothing
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t"),
      (2L, "f g h i j k l"),
      (3L, "z y x w v u t s r q z2 y2 x2 w2")).toDF("doc_id", "text")
    // reuse the OPERATOR's shingle+intersect arithmetic through a direct
    // pair computation (the query's cand set is LSH-recall-dependent, so
    // the invariant is checked on a forced pair)
    val sh = docs
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("shingles", array_distinct(expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))")))
      .select("doc_id", "shingles")
    val a = sh.filter(col("doc_id") === 1).select(col("shingles").as("sh_a"))
    val b = sh.filter(col("doc_id") === 2).select(col("shingles").as("sh_b"))
    val r = a.crossJoin(b)
      .select((graft.functions.ArrayOps.intersectCount(col("sh_a"), col("sh_b"))
        .cast("double") / size(col("sh_b")).cast("double")).as("containment_b"))
      .collect().head.getDouble(0)
    assert(r === 1.0)
    // and the registered query emits both directional ratios in [0, 1]
    val q = Dedup.containmentPairs(spark, dir).collect()
    q.foreach { row =>
      val ca = row.getAs[Double]("containment_a")
      val cb = row.getAs[Double]("containment_b")
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0, row.toString)
    }
  }

  test("win_ohlc_downsample: bars agree with a sequential per-bucket reference") {
    val got = Windows.ohlcDownsample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toMap
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("t"),
        date_trunc("hour", col("ts")).as("h"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getTimestamp(3),
        r.getDecimal(4).doubleValue()))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._4)).foreach { case ((u, h), es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val (open, high, low, close, n) = got((u, h))
      assert(open === sorted.head._5, s"open $u $h")
      assert(close === sorted.last._5, s"close $u $h")
      assert(high === es.map(_._5).max, s"high $u $h")
      assert(low === es.map(_._5).min, s"low $u $h")
      assert(n === es.length.toLong, s"n $u $h")
    }
  }

  test("win_active_streaks matches a sequential gaps-and-islands reference") {
    val got = Windows.activeStreaks(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val days = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    assert(days.nonEmpty)
    days.groupBy(_._1).foreach { case (u, ds) =>
      val sorted = ds.map(_._2).sortBy(_.toEpochDay)
      // fold into runs of consecutive days
      val runs = sorted.foldLeft(List.empty[List[Long]]) { (acc, d) =>
        acc match {
          case (h :: t) :: rest if d.toEpochDay == h + 1 => (d.toEpochDay :: h :: t) :: rest
          case _ => List(d.toEpochDay) :: acc
        }
      }
      val (longest, nStreaks, nDays) = got(u)
      assert(longest === runs.map(_.length).max.toLong, s"user $u longest")
      assert(nStreaks === runs.length.toLong, s"user $u n_streaks")
      assert(nDays === sorted.length.toLong, s"user $u n_days")
    }
  }

  test("rel_interval_overlap: banded join equals the brute-force overlap scan") {
    val got = Relational.intervalOverlapJoin(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val act = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), expr("ts_ns div 1000").as("t"))
      .groupBy("user_id", "d").agg(min("t").as("s"), max("t").as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val baseUs = java.time.LocalDateTime.of(2024, 1, 3, 12, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val camps = (0L until 52L).map(w =>
      (w, baseUs + w * 604800000000L, baseUs + w * 604800000000L + 237600000000L))
    val brute = (for {
      (u, s, e) <- act
      (cid, cs, ce) <- camps if e > cs && ce > s
    } yield (cid, u, math.min(e, ce) - math.max(s, cs)))
      .groupBy(_._1).map { case (cid, xs) =>
        cid -> (xs.size.toLong, xs.map(_._2).distinct.size.toLong, xs.map(_._3).sum)
      }
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("rel_dq_audit emits all six checks; testdata integrity violations are stable") {
    val rows = Relational.dqAudit(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq(
      "chk_documents_nchars", "chk_events_value_nonneg", "chk_lineitem_qty_positive",
      "fk_lineitem_orders", "fk_orders_customer", "pk_orders_unique"))
    // referential + uniqueness checks must be clean on the generated data
    rows.filter(r => r.getString(0).startsWith("fk_") || r.getString(0).startsWith("pk_"))
      .foreach(r => assert(r.getLong(1) === 0L, r.toString))
  }

  test("agg_hll_sketch_merge: merged estimate within the 5% gate") {
    val r = Aggregations.hllSketchMergeChecked(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Boolean]("within_tol"))
    assert(r(0).getAs[Long]("exact_users") > 0)
  }
}
