package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Substring/paragraph-level dedup: repeated SPANS inside otherwise-
  * distinct documents must be found and accounted — the case document-
  * level LSH cannot express (the surrounding text differs, so the doc
  * signatures don't collide).
  */
class ParagraphDedupSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-para-dedup-test")
  import spark.implicits._

  private val boiler =
    "this document is provided under the creative commons license " +
      "with no warranty of any kind either express or implied"
  private val boilerNear = boiler.replace("kind", "sort") // near-dup span

  test("a shared boilerplate paragraph across distinct docs is removed " +
    "from all but the first") {
    // three documents with DIFFERENT bodies but the same license header;
    // doc-level text differs everywhere, only the span repeats
    val docs = Seq(
      (1L, boiler + "\n" + "alpha body about rivers and mountains and long valleys " +
        "with seventeen bridges crossing the northern range"),
      (2L, boiler + "\n" + "beta body concerning maritime navigation charts and " +
        "lighthouse schedules along the western coastline"),
      (3L, boilerNear + "\n" + "gamma body on orchard cultivation and seasonal " +
        "harvest rotation across terraced hillsides")
    ).toDF("doc_id", "text")
    val acct = Dedup.paragraphDedupOf(Dedup.paragraphsByDelim(docs))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 keeps its header (first occurrence, min pid); docs 2 and 3
    // lose theirs (doc 3 via the MinHash near-dup path: one token differs)
    assert(acct(1L) == ((2L, 0L, 0L)), s"doc 1 should keep everything: ${acct(1L)}")
    assert(acct(2L) == ((2L, 1L, boiler.length.toLong)),
      s"doc 2 should lose the exact header span: ${acct(2L)}")
    assert(acct(3L) == ((2L, 1L, boilerNear.length.toLong)),
      s"doc 3 should lose the near-dup header span: ${acct(3L)}")
  }

  test("document-level dedup misses the shared span (the gap this operator closes)") {
    val docs = Seq(
      (1L, boiler + " alpha body about rivers and mountains and long valleys"),
      (2L, boiler + " beta body concerning maritime navigation charts today")
    ).toDF("doc_id", "text")
    // doc-level: two documents, both canonical (no exact dup; bodies
    // diverge enough that the doc signatures need not collide for the
    // point to hold — we assert on the PARAGRAPH result instead)
    val para = Dedup.paragraphDedupOf(Dedup.paragraphs(docs, tokensPerPara = 17))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // 17-token spans align the shared boilerplate into span 0 of each doc
    assert(para(2L)._2 >= 1L, s"span-level dedup should remove doc 2's shared span: $para")
  }

  test("fixed-span chunking: ordinals, span text, and tail spans") {
    val docs = Seq((7L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Dedup.paragraphs(docs, tokensPerPara = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq((7L, 0, "a b c"), (7L, 1, "d e f"), (7L, 2, "g")))
  }

  test("delimiter paragraphs: blanks dropped, ordinals preserved") {
    val docs = Seq((7L, "first para\n\nsecond para")).toDF("doc_id", "text")
    val got = Dedup.paragraphsByDelim(docs)
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq((0, "first para"), (2, "second para")))
  }

  test("no duplicate spans: accounting is all-zero removals") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val acct = Dedup.paragraphDedupOf(Dedup.paragraphs(docs, 5))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(acct(1L) == ((2L, 0L, 0L)) && acct(2L) == ((3L, 0L, 0L)), acct.toString)
  }
}
