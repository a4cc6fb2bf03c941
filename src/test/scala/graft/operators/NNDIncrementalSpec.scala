package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Incremental graph-ANN maintenance (`sim_nnd_incremental`): batch
  * nodes inserted into the persisted corpus NN-descent graph get full
  * ranked corpus-only neighbor lists, and the insert's recall@k against
  * exact brute force must MEET the from-scratch build's recall on the
  * same data — the "maintenance must not degrade the index" contract
  * (the DuckDB oracle already pins the exact arithmetic; these pin the
  * quality and structure claims). Runs on the sf0.01 testdata because
  * the operator is a dir-level lifecycle op (IndexStore-backed corpus
  * graph), not a frame transform. */
class NNDIncrementalSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-nnd-incr-test")
  private val dir = "/root/testdata/sf0.01"

  test("insert emits a full ranked corpus-only neighbor list per probe") {
    val rows = Similarity.nndIncremental(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 20) // batch ids 0,7,...,133
    byQ.foreach { case (q, rs) =>
      assert(q % 7 === 0 && q < 140)
      assert(rs.length === 10, s"probe $q has ${rs.length} neighbors")
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq === (1 to 10))
      rs.foreach { r =>
        val v = r.getAs[Long]("vec_id")
        assert(v % 7 != 0L, s"batch node $q linked to batch id $v — " +
          "inserts must only touch the corpus graph")
      }
      val ordered = rs.sortBy(_.getAs[Int]("rnk"))
        .map(r => (r.getAs[Double]("cos"), r.getAs[Long]("vec_id")))
      ordered.sliding(2).foreach {
        case Array((c1, v1), (c2, v2)) =>
          assert(c1 > c2 || (c1 == c2 && v1 < v2),
            s"probe $q ranking violates (cos desc, id asc): ($c1,$v1) before ($c2,$v2)")
        case _ => ()
      }
    }
  }

  test("incremental-insert recall meets the from-scratch build's recall") {
    val inc = Similarity.nndIncrementalRecall(spark, dir)
      .collect()(0).getAs[Long]("recall_ppm")
    val scratch = Similarity.nndescentRecall(spark, dir)
      .collect()(0).getAs[Long]("recall_ppm")
    // measured: incremental 580000 ppm vs from-scratch 220000 at sf0.01
    // (240000 vs 65000 at sf0.1) — the entry-anchored beam + local
    // refinement actually beats the 3-round build; the gate only
    // requires parity
    assert(inc >= scratch,
      s"incremental recall $inc ppm below from-scratch build $scratch ppm")
    assert(inc >= 300000L, s"incremental recall $inc ppm below absolute floor")
  }
}
