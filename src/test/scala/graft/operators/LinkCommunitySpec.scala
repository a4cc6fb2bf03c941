package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Link prediction and label-propagation communities: hand-checkable
  * graphs where the structural scores / community split are derivable on
  * paper, plus determinism under repartitioning. */
class LinkCommunitySpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-linkcomm-test")

  private def pairsDf(pairs: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("part_a", "part_b", "n_orders")
  }

  test("linkPredict scores the open triad and skips existing edges") {
    // path 1-2-3 plus pendant 4 on 2: non-edges sharing a neighbor are
    // (1,3) via 2, (1,4) via 2, (3,4) via 2 — all with cn=1.
    // deg: 1→1, 2→3, 3→1, 4→1, so jaccard = 1/(1+1-1) = 1e6 ppm each.
    val pc = pairsDf(Seq((1L, 2L, 5L), (2L, 3L, 5L), (2L, 4L, 5L)))
    val got = Graph.linkPredictOfPairs(pc, k = 8, topN = 50)
      .collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("n_common"), r.getAs[Long]("jaccard_ppm")))
      .toSet
    assert(got === Set((1L, 3L, 1L, 1000000L), (1L, 4L, 1L, 1000000L),
      (3L, 4L, 1L, 1000000L)))
  }

  test("linkPredict never emits an existing edge and ranks by cn first") {
    // two squares sharing an edge: 1-2, 2-3, 3-4, 4-1 (square A),
    // 3-5, 5-6, 6-4 (square B on edge 3-4). Diagonals (1,3),(2,4) of A
    // have cn=2; (4,5),(3,6) have cn=2; cross pairs have cn=1.
    val pc = pairsDf(Seq((1L, 2L, 9L), (2L, 3L, 9L), (3L, 4L, 9L), (1L, 4L, 9L),
      (3L, 5L, 9L), (5L, 6L, 9L), (4L, 6L, 9L)))
    val rows = Graph.linkPredictOfPairs(pc, k = 8, topN = 50).collect()
    val asPairs = rows.map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))).toSet
    // no existing edge reappears
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (3L, 5L), (5L, 6L), (4L, 6L))
      .foreach(e => assert(!asPairs.contains(e), s"existing edge $e emitted"))
    // the four diagonals lead with cn=2
    val top = rows.takeWhile(_.getAs[Long]("n_common") == 2L)
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))).toSet
    assert(top === Set((1L, 3L), (2L, 4L), (4L, 5L), (3L, 6L)))
  }

  test("labelPropagation separates two cliques joined by a bridge") {
    // clique {1,2,3} + clique {10,11,12} + bridge 3-10: each clique ends
    // as its own community of 3 (hand-traced: left settles on label 1;
    // the right clique's label is PULLED THROUGH the bridge — node 10
    // adopts 3 in round 1 and the clique follows — so the right
    // community carries label 3, not 10; the split itself is stable
    // because each bridge endpoint sees 2 clique vs 1 bridge neighbor).
    val pairs = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (10L, 11L, 1L), (10L, 12L, 1L), (11L, 12L, 1L), (3L, 10L, 1L))
    val got = Graph.labelPropagationOfPairs(
        pairsDf(pairs).select("part_a", "part_b"), iters = 4)
      .collect().map(r => r.getAs[Long]("community_id") -> r.getAs[Long]("n_parts"))
      .toMap
    assert(got === Map(1L -> 3L, 3L -> 3L))
  }

  test("labelPropagation is repartition-invariant (deterministic mode tie-break)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val pairs = (1 to 120).map { _ =>
      val a = rng.nextInt(40).toLong; val b = a + 1 + rng.nextInt(10).toLong
      (a, b)
    }.distinct
    val df = pairs.toDF("part_a", "part_b")
    val base = Graph.labelPropagationOfPairs(df, 4).collect().toSeq
    val shuf = Graph.labelPropagationOfPairs(df.repartition(13), 4).collect().toSeq
    assert(base.map(_.toString) === shuf.map(_.toString))
  }
}
