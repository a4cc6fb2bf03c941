package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 feature operators: EWMA (sequential-reference differential),
  * fuzzy blocking ER join (brute-force differential + plan contract),
  * tokenizer encoding (vocab-rank consistency), HLL sketch-merge gate. */
class FeatureOpsSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-featureops-test")
  private val dir = "/root/testdata/sf0.001"

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

  test("agg_hll_sketch_merge: merged estimate within the 5% gate") {
    val r = Aggregations.hllSketchMergeChecked(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Boolean]("within_tol"))
    assert(r(0).getAs[Long]("exact_users") > 0)
  }
}
