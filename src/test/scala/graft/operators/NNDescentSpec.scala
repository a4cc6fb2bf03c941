package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** NN-descent k-NN-graph construction: known-answer geometry (two
  * orthogonal clusters), bounded-degree invariants, and the convergence
  * property that makes the algorithm work — the kept set per node only
  * improves as rounds add candidates, so recall vs brute force is
  * non-decreasing in rounds. The DuckDB oracle replays the exact build
  * on the synthetic corpus (`sim_nndescent_topk` / `sim_nndescent_recall`);
  * these pin the rules on inputs small enough to check by hand. */
class NNDescentSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-nndescent-test")

  private def embDf(vecs: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  // deterministic jittered cluster around a center (no shared RNG state:
  // one seeded generator per vector)
  private def cluster(center: Array[Float], ids: Range, seed: Int): Seq[(Long, Array[Float])] =
    ids.map { i =>
      val rnd = new scala.util.Random(seed + i)
      (i.toLong, center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f))
    }

  private val dims = 8
  private val cA = Array.fill(dims)(1.0f)
  private val cB = Array.tabulate(dims)(d => if (d % 2 == 0) -1.0f else 1.0f) // cA·cB = 0
  private val docs = cluster(cA, 0 until 12, 7) ++ cluster(cB, 12 until 24, 99)

  // engine-exact brute-force top-k (same milli-quantization, same
  // (cos desc, id asc) tie-break) for recall measurement
  private def bruteTopK(vecs: Seq[(Long, Array[Float])], k: Int): Map[Long, Set[Long]] = {
    def q(a: Array[Float]): Array[Long] = a.map(x => math.round(x.toDouble * 1000))
    val qs = vecs.map { case (id, a) => (id, q(a)) }
    qs.map { case (u, qu) =>
      val scored = qs.filter(_._1 != u).map { case (v, qv) =>
        val dot = qu.zip(qv).map { case (x, y) => x * y }.sum
        val na = qu.map(x => x * x).sum
        val nb = qv.map(x => x * x).sum
        (v, dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
      }
      u -> scored.sortBy { case (v, c) => (-c, v) }.take(k).map(_._1).toSet
    }.toMap
  }

  private def recallAt(rounds: Int, k: Int): Double = {
    val knn = Similarity.nndescentKnnOf(embDf(docs), k, rounds).collect()
      .groupBy(_.getAs[Long]("u"))
      .map { case (u, rows) => u -> rows.map(_.getAs[Long]("v")).toSet }
    val brute = bruteTopK(docs, k)
    val hits = brute.map { case (u, truth) =>
      knn.getOrElse(u, Set.empty).count(truth.contains)
    }.sum
    hits.toDouble / (brute.size * k)
  }

  test("two orthogonal clusters: after 2 rounds every neighbor is same-cluster, " +
    "degree is exactly k, no self edges") {
    val knn = Similarity.nndescentKnnOf(embDf(docs), k = 4, rounds = 2).collect()
    assert(knn.nonEmpty)
    knn.foreach { r =>
      val u = r.getAs[Long]("u"); val v = r.getAs[Long]("v")
      assert(u !== v)
      assert((u < 12) === (v < 12), s"neighbor list crossed clusters: $u -> $v")
      assert(r.getAs[Double]("cos") > 0.9) // tight same-cluster geometry
    }
    val degrees = knn.groupBy(_.getAs[Long]("u")).map(_._2.length).toSet
    assert(degrees === Set(4))
    assert(knn.map(_.getAs[Long]("u")).distinct.length === 24)
  }

  test("recall vs brute force is non-decreasing in rounds and converges high") {
    val r0 = recallAt(0, 4)
    val r1 = recallAt(1, 4)
    val r2 = recallAt(2, 4)
    assert(r1 >= r0, s"round 1 recall $r1 < seed recall $r0")
    assert(r2 >= r1, s"round 2 recall $r2 < round 1 recall $r1")
    assert(r2 >= 0.8, s"converged recall $r2 below floor")
    assert(r0 < 1.0, "ring seed alone should not already be exact on clustered data")
  }

  test("neighbor lists are ranked by cosine desc with vec_id asc ties") {
    val knn = Similarity.nndescentKnnOf(embDf(docs), k = 4, rounds = 1).collect()
    knn.groupBy(_.getAs[Long]("u")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Int]("rnk"))
      val pairs = ordered.map(r => (r.getAs[Double]("cos"), r.getAs[Long]("v")))
      pairs.sliding(2).foreach {
        case Array((c1, v1), (c2, v2)) =>
          assert(c1 > c2 || (c1 == c2 && v1 < v2))
        case _ => ()
      }
    }
  }
}
