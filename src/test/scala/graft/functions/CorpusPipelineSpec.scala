package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The composed corpus-preparation pipeline: quality gate → near-dedup
  * keep-set → split assignment → accounting. Planted corpus checks each
  * stage contributes: low-quality docs never reach dedup, verbatim AND
  * near-duplicate survivors collapse to one canonical training doc. */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-corpus-pipeline-test")
  import spark.implicits._

  test("quality-fail docs drop; verbatim + near-dup survivors collapse to one") {
    val base =
      "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (0L, base, "en"),                                   // canonical
      (1L, base, "en"),                                   // verbatim dup
      (2L, base.replace("today", "tonight"), "en"),       // near dup
      (3L, "too short", "en"),                            // quality: < 10 tokens
      // quality: stopword ratio 6/12 = 0.5 > 0.4
      (4L, "the the the a a and one two three four five six", "en"),
      (5L, "ein ganz anderer text ohne gemeinsame schindeln mit irgendwem " +
        "sieben acht neun zehn elf zwoelf", "de")         // unrelated, kept
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.corpusPipelineOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // exactly one English doc survives (the canonical of {0,1,2}) and the
    // German one — whatever split buckets they hash to
    assert(got.map(_._3).sum == 2, s"expected 2 kept docs total: ${got.toSeq}")
    val byLang = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byLang == Map("en" -> 1L, "de" -> 1L), s"kept-per-lang off: ${got.toSeq}")
    // token accounting follows the kept docs
    val enTokens = got.filter(_._1 == "en").map(_._4).sum
    assert(enTokens == base.split(" ").length.toLong, s"en token total off: ${got.toSeq}")
  }
}
