package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Incremental ingest dedup: a new batch admitted against an existing
  * corpus — verbatim copies rejected exactly, LSH-bucket collisions
  * rejected as near-dups, fresh content accepted; the corpus is never
  * paired with itself. */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-incremental-test")
  import spark.implicits._

  test("batch verdicts: dup_exact / dup_near / accept, each exercised") {
    val base =
      "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different content with no shared shingles at all " +
      "zebra quartz violin mountain seventeen"
    val corpus = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val batch = Seq(
      (100L, base),                                 // verbatim corpus copy
      (101L, other.replace("zebra", "yak")),        // near-dup of corpus doc 2
      (102L, "ein ganz anderer text ohne gemeinsame schindeln mit irgendwem " +
        "sieben acht neun zehn elf zwoelf")         // fresh
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedupOf(batch, corpus).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("dup_exact") == ((1L, 100L, 100L)), s"exact verdict off: $got")
    assert(got("dup_near") == ((1L, 101L, 101L)), s"near verdict off: $got")
    assert(got("accept") == ((1L, 102L, 102L)), s"accept verdict off: $got")
  }
}
