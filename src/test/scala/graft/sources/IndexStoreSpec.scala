package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** The build-once-ACROSS-sessions contract of IndexStore.orBuild:
  * catalog miss + existing files + matching sidecar → metadata-only
  * re-registration; the build closure must never run. Dropping the
  * external table simulates a fresh session exactly (the in-memory
  * catalog entry is gone, the files are not — same state a new JVM
  * sees). */
class IndexStoreSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-indexstore-test")

  private def freshName(): String =
    s"idx_spec_${System.nanoTime()}"

  private def buildDf = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong % 10, i.toLong, s"v$i")).toDF("k", "id", "v")
  }

  test("second resolution after catalog loss registers from disk; build closure never runs") {
    val name = freshName()
    val first = IndexStore.orBuild(spark, name, 4, Seq("k"))(buildDf)
    val firstRows = first.orderBy("id").collect().toSeq
    assert(firstRows.size == 100)

    spark.sql(s"DROP TABLE `$name`") // external: metadata only, files survive
    assert(!spark.catalog.tableExists(name))

    var rebuilt = false
    val second = IndexStore.orBuild(spark, name, 4, Seq("k")) {
      rebuilt = true; buildDf
    }
    assert(!rebuilt, "disk-registration path must not evaluate the build closure")
    assert(spark.catalog.tableExists(name))
    assert(second.orderBy("id").collect().toSeq == firstRows)
  }

  test("re-registered table keeps its bucketing: groupBy on the key needs no shuffle") {
    val name = freshName()
    IndexStore.orBuild(spark, name, 4, Seq("k"))(buildDf)
    spark.sql(s"DROP TABLE `$name`")
    val again = IndexStore.orBuild(spark, name, 4, Seq("k"))(sys.error("no rebuild"))
    val agg = again.groupBy("k").count()
    agg.collect()
    val shuffles = agg.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"bucketed scan should satisfy the groupBy distribution; plan:\n${agg.queryExecution.executedPlan}")
  }

  test("geometry drift (bucket count or keys) falls back to rebuild, not wrong metadata") {
    val name = freshName()
    IndexStore.orBuild(spark, name, 4, Seq("k"))(buildDf)
    spark.sql(s"DROP TABLE `$name`")
    var rebuilt = false
    IndexStore.orBuild(spark, name, 8, Seq("k")) { rebuilt = true; buildDf }
    assert(rebuilt, "mismatched sidecar must trigger a rebuild")
    assert(spark.catalog.tableExists(name))
  }
}
