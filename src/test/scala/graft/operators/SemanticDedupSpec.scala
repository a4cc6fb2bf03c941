package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup invariants: the keep-set is exactly one canonical per group,
  * groups never span k-means cells unless chained by pairs, and every
  * removed vector has a same-cell near-duplicate above threshold. */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-semdedup-test")
  private val dir = "/root/testdata/sf0.001"

  test("sim_semantic_dedup keep-set invariants") {
    val rows = Similarity.semanticDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    val byGroup = rows.groupBy(_.getAs[Long]("group_id"))
    byGroup.foreach { case (gid, members) =>
      // exactly one canonical per group, and it's the min vec_id
      val kept = members.filter(_.getAs[Boolean]("is_kept"))
      assert(kept.length === 1, s"group $gid")
      assert(kept.head.getAs[Long]("vec_id") === members.map(_.getAs[Long]("vec_id")).min)
      // group_size column is consistent
      members.foreach(m => assert(m.getAs[Long]("group_size") === members.length.toLong))
    }
    // total: every vector appears exactly once
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    assert(rows.length.toLong === n)
  }

  test("multi-member groups sit inside one cell (pairs never cross cells)") {
    val rows = Similarity.semanticDedup(spark, dir).collect()
    rows.groupBy(_.getAs[Long]("group_id")).filter(_._2.length > 1).foreach {
      case (gid, members) =>
        // direct pairs are same-cell; transitive chains could in theory
        // bridge cells, but with single-cell pair generation a group can
        // only contain multiple cells if chained through shared members —
        // assert the observed testdata groups are cell-pure (documents
        // the clustering-scoped semantics SemDeDup intends)
        assert(members.map(_.getAs[Long]("cell")).distinct.length === 1,
          s"group $gid spans cells")
    }
  }
}
