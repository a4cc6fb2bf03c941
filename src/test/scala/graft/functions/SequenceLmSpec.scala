package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Markov event transitions and bigram-LM quality scoring: sequential
  * in-memory references recomputed from collected rows. */
class SequenceLmSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-seqlm-test")
  private val dir = "/root/testdata/sf0.001"

  test("win_event_transitions matches the sequential per-user pair walk") {
    val got = graft.operators.Windows.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val steps = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val seq = es.sortBy(e => (e._3, e._2)).map(_._4)
      seq.zip(seq.drop(1)).map { case (f, t) => (f, t, u) }
    }
    val byPair = steps.groupBy(s => (s._1, s._2))
    val fromTotals = steps.groupBy(_._1).map { case (f, ss) => f -> ss.size.toLong }
    val expect = byPair.map { case ((f, t), ss) =>
      (f, t) -> (ss.size.toLong, ss.map(_._3).distinct.size.toLong,
        ss.size.toLong * 1000000L / fromTotals(f))
    }
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("transition probabilities row-normalize: each from_type's ppm sums to ~1e6") {
    val rows = graft.operators.Windows.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (f, rs) =>
      val s = rs.map(_._2).sum
      // integer floor division loses < |to-types| ppm per row
      assert(s <= 1000000L && s > 1000000L - rs.length, s"row $f sums to $s")
    }
  }

  test("ta_bigram_lm_score matches the sequential count-model reference") {
    val got = CorpusOps.bigramLmScore(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty).toVector)
    val c1 = docs.flatMap(_._2).groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val c2 = docs.flatMap { case (_, t) => t.zip(t.drop(1)) }
      .groupBy(identity).map { case (b, bs) => b -> bs.size.toLong }
    val expect = docs.collect { case (id, t) if t.length >= 2 =>
      val ppms = t.zip(t.drop(1)).map { case (w1, w2) =>
        c2((w1, w2)) * 1000000L / c1(w1)
      }
      id -> (ppms.length.toLong, ppms.sum / ppms.length)
    }.toMap
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("win_last_touch matches the sequential per-user walk (purchases " +
    "credited to the latest strictly-preceding view/click)") {
    val got = graft.operators.Windows.lastTouchAttribution(spark, dir).collect()
      .map(r => r.getLong(1) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getString(4)),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = scala.collection.mutable.Map.empty[Long, (Option[Long], Option[String], Option[Long])]
    rows.groupBy(_._1).foreach { case (_, es) =>
      var touch: Option[(Long, String, Long)] = None
      es.sortBy(e => (e._3, e._2)).foreach { case (_, id, us, tpe) =>
        if (tpe == "purchase")
          expect(id) = (touch.map(_._1), touch.map(_._2),
            touch.map(t => (us - t._3) / 1000000L))
        if (tpe == "view" || tpe == "click") touch = Some((id, tpe, us))
      }
    }
    assert(got.nonEmpty)
    assert(got === expect.toMap)
  }

  test("ta_tfidf_keywords: a token unique to one document outranks every " +
    "corpus-wide token in that document") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma zzyzx zzyzx"),
      (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfKeywordsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(5)) -> r.getString(1)).toMap
    assert(got((1L, 1L)) === "zzyzx") // tf=2, df=1 → 2e6 ppm, beats 333333
  }

  test("ta_tfidf_keywords matches the sequential count reference on testdata") {
    val got = graft.functions.TextAnalysis.tfidfKeywords(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(5)) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty).toVector)
    val tf = docs.flatMap { case (id, t) => t.map(id -> _) }
      .groupBy(identity).map { case ((id, w), xs) => (id, w) -> xs.size.toLong }
    val dfc = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val expect = tf.keys.groupBy(_._1).flatMap { case (id, ks) =>
      ks.toSeq
        .map { case (_, w) => (w, tf((id, w)), dfc(w), tf((id, w)) * 1000000L / dfc(w)) }
        .sortBy { case (w, _, _, s) => (-s, w) }
        .take(3).zipWithIndex
        .map { case ((w, t, d, s), i) => (id, i + 1L) -> (w, t, d, s) }
    }
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("ta_vocab_coverage: known curve on a hand-built corpus and minimality " +
    "of each threshold rank") {
    import spark.implicits._
    // counts: the=6, cat=3, dog=1 → total 10; curve: rank1=600000,
    // rank2=900000, rank3=1000000 → thresholds 50/90/99% hit at 1/2/3
    val docs = Seq((1L, "the cat the dog the cat"),
      (2L, "the the the cat")).toDF("doc_id", "text")
    val got = CorpusOps.vocabCoverageOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      500000L -> ((1L, 600000L, 6L)),
      900000L -> ((2L, 900000L, 9L)),
      990000L -> ((3L, 1000000L, 10L))))
  }

  test("ta_vocab_coverage on testdata: ranks monotone in threshold, each " +
    "rank minimal (previous rank is below its threshold)") {
    val rows = CorpusOps.vocabCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.length === 3)
    assert(rows.map(_._2) === rows.map(_._2).sorted) // monotone ranks
    rows.foreach { case (thr, _, cov) => assert(cov >= thr) }
  }

  test("win_rank_changes: both period rankings are permutations of 1..n and " +
    "movements sum to zero") {
    val rows = graft.operators.Windows.rankChanges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    assert(rows.map(_._2).sorted.toSeq === (1L to n))
    assert(rows.map(_._3).sorted.toSeq === (1L to n))
    assert(rows.map(_._4).sum === 0L) // rank changes are zero-sum
  }

  test("bigram scores rank a shuffled-token document below its source") {
    import spark.implicits._
    // 30 copies of a fluent sentence + ONE doc with the same tokens in a
    // scrambled order: the model learns the fluent transitions, so the
    // scrambled doc must score strictly lower
    val fluent = "the quick brown fox jumps over the lazy dog"
    val scrambled = "dog the over quick lazy fox the brown jumps"
    val docs = ((1L to 30L).map(i => (i, fluent)) :+ (99L, scrambled))
      .toDF("doc_id", "text")
    val scores = CorpusOps.bigramLmScoreOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(99L) < scores(1L))
  }
}
