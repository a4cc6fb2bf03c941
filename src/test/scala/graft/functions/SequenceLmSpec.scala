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
