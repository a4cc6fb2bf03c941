package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** BM25 ranking invariants on a planted fixture: coverage dominates,
  * zero-overlap docs never rank, integer-micro scores are stable. */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-bm25-test")
  import spark.implicits._

  test("docs covering more query tokens outrank partial matches; zero-overlap docs never appear") {
    val q0 = CorpusOps.benchmarkSentences.head // "the fast scan joins the small table with a hash value"
    val docs = Seq(
      (1L, q0),                                        // full coverage of q0
      (2L, "a fast scan and a hash are useful"),       // partial coverage
      (3L, "unrelated words entirely here borscht"),   // zero overlap
      (4L, "the the the the the the the the")          // common-token-only spam
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopKOf(spark, docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val q0rank = got.filter(_._1 == 0L).sortBy(_._2)
    assert(q0rank.nonEmpty)
    assert(q0rank.head._3 == 1L,
      s"full-coverage doc not ranked first for q0: ${q0rank.toSeq}")
    val ranked2 = q0rank.find(_._3 == 2L)
    assert(ranked2.isDefined && ranked2.get._2 < q0rank.find(_._3 == 4L).map(_._2).getOrElse(99),
      s"partial-coverage doc not above common-token spam: ${q0rank.toSeq}")
    assert(!got.exists(_._3 == 3L), s"zero-overlap doc ranked: ${got.toSeq}")
    // scores are positive exact integers
    assert(got.forall(_._4 > 0L))
  }

  test("scoring is deterministic across repartitionings (integer-micro sums are order-free)") {
    val docs = (0L until 50L)
      .map(i => (i, s"fast scan value token$i hash table join the small"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.bm25TopKOf(spark, docs).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.bm25TopKOf(spark, docs.repartition(7)).collect().map(_.toSeq).toSeq
    assert(a == b, "BM25 output changed under repartitioning")
  }
}
