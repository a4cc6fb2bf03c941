package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The persisted group-label indexes must be RESULT-INVISIBLE: serving
  * dedup groups from the build-once `dd_groups` / `sim_groups` tables
  * has to return exactly what the inline pairs→components→keep-set
  * derivation returns on the same corpus. A drifted index would
  * silently poison every downstream keep-set consumer. */
class PersistedGroupsSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-persisted-groups-test")
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("dd_dedup_groups served from the persisted index == inline derivation") {
    val served = rows(Dedup.dedupGroups(spark, dir))
    val inline = rows(Dedup.dedupGroupsOf(
      graft.sources.Tables.documents(spark, dir)))
    assert(served == inline)
  }

  test("sim_dedup_groups served from the persisted index == inline derivation") {
    val served = rows(Similarity.embeddingDedupGroups(spark, dir))
    val inline = rows(Similarity.embeddingDedupGroupsInline(spark, dir, 0.4))
    assert(served == inline)
  }
}
