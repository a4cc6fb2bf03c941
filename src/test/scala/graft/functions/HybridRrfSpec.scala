package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Hybrid retrieval: the fused ranking must equal an independent
  * driver-side reciprocal-rank fusion of the two legs' own outputs —
  * and keep the integer-micro contract (every fused score a sum of
  * `1000000 div (60 + r)` terms). */
class HybridRrfSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-hybrid-rrf-test")

  private val dir = "/root/testdata/sf0.001"

  test("fused ranking replays an independent RRF of the two retrieval legs") {
    val lex = TextAnalysis.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(1))) // (q, doc, rnk)
    val vec = graft.operators.Similarity.annMultiQueryTopK(spark, dir, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(1)))
    val contrib = (lex ++ vec).map { case (q, d, r) => ((q, d), 1000000L / (60 + r)) }
    val fused = contrib.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = fused.groupBy(_._1._1).flatMap { case (q, m) =>
      m.toSeq.map { case ((_, d), s) => (d, s) }
        .sortBy { case (d, s) => (-s, d) }.take(5).zipWithIndex
        .map { case ((d, s), i) => (q, i + 1, d, s) }
    }.toSet
    val got = TextAnalysis.hybridRrf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"got=$got\nexpected=$expected")
    assert(got.map(_._1) == Set(0L, 1L, 2L), "all three hybrid queries present")
  }

  test("fusion sum path: a doc in both lists beats every single-leg doc") {
    import spark.implicits._
    // doc 100 is rank 5 in BOTH legs; docs 1/2 lead one leg each.
    // 2/(60+5) > 1/(60+1), so 100 must fuse to rank 1.
    val lex = Seq((0L, 1L, 1), (0L, 3L, 2), (0L, 100L, 5)).toDF("q_id", "doc_id", "rnk")
    val vec = Seq((0L, 2L, 1), (0L, 4L, 2), (0L, 100L, 5)).toDF("q_id", "doc_id", "rnk")
    val got = TextAnalysis.rrfFuseOf(lex, vec, 5).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.head == ((1, 100L, 2 * (1000000L / 65))), s"head: ${got.head}")
    // single-leg ties break by doc_id ascending at identical rrf
    assert(got.map(_._2).toSeq == Seq(100L, 1L, 2L, 3L, 4L), s"order: ${got.toSeq}")
  }

  test("docs appearing in both legs outrank equal-rank single-leg docs") {
    // structural property of RRF with these contributions: any doc in
    // BOTH top-5 lists scores at least 2*15384 > 16393 (the max single
    // contribution), so it must rank above every single-leg doc
    val lex = TextAnalysis.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val vec = graft.operators.Similarity.annMultiQueryTopK(spark, dir, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val both = lex intersect vec
    val got = TextAnalysis.hybridRrf(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), (r.getInt(1), r.getLong(3))))
      .toMap
    for (((q, d), (rnk, score)) <- got if both.contains((q, d))) {
      assert(score >= 2 * 15384L, s"two-leg doc ($q,$d) score $score")
      for (((q2, d2), (rnk2, score2)) <- got
           if q2 == q && !both.contains((q2, d2)))
        assert(score > score2 && rnk < rnk2,
          s"two-leg ($q,$d,$score) vs single-leg ($q2,$d2,$score2)")
    }
  }
}
