package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Inverted-index invariants: full document frequency with a capped,
  * ascending posting list — the cap enforced by the partial top-k
  * aggregation, never by a per-token window. */
class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-invidx-test")
  import spark.implicits._

  test("df counts every doc; postings cap at 8 smallest doc_ids ascending") {
    // 'common' in all 12 docs (df 12, postings capped at the 8 smallest
    // ids); 'rare7' only in doc 7; per-doc token repetition must not
    // inflate df
    val docs = (0L until 12L).map { i =>
      val extra = if (i == 7) " rare7 rare7" else ""
      (i, s"common common unique$i$extra")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndexOf(docs, cap = 8).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got("common") == ((12L, "0,1,2,3,4,5,6,7")), s"common: ${got("common")}")
    assert(got("rare7") == ((1L, "7")), s"rare7: ${got("rare7")}")
    assert(got("unique3") == ((1L, "3")))
    assert(got.size == 14, s"vocabulary size: ${got.keys.toSeq.sorted}")
  }

  test("postings order survives out-of-order input (merge path of the top-k buffer)") {
    val docs = Seq(11L, 3L, 9L, 1L, 7L, 5L).map(i => (i, "tok")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndexOf(docs, cap = 4).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((6L, "1,3,5,7")))
  }
}
