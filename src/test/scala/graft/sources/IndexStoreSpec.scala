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

  test("build-once holds on a file:-scheme Hadoop URI index root (object-store path shape)") {
    // The 100 TB deployment stores indexes on HDFS/S3 — addressed by a
    // Hadoop URI, not a local path. file:// exercises the same Hadoop
    // FileSystem resolution, sidecar probe, and sidecar write code path
    // that hdfs:// / s3a:// would take (r7 verdict #3).
    val name = freshName()
    val root = s"file://${new java.io.File("target/index_fsspec").getAbsolutePath}"
    val first = IndexStore.orBuild(spark, name, 4, Seq("k"), root)(buildDf)
    val firstRows = first.orderBy("id").collect().toSeq
    spark.sql(s"DROP TABLE `$name`")
    var rebuilt = false
    val second = IndexStore.orBuild(spark, name, 4, Seq("k"), root) {
      rebuilt = true; buildDf
    }
    assert(!rebuilt, "file:-scheme sidecar probe must re-register, not rebuild")
    assert(second.orderBy("id").collect().toSeq == firstRows)
  }

  test("keyOf is inventory-sensitive through the Hadoop FileSystem on file:-scheme dirs") {
    val dir = java.nio.file.Files.createTempDirectory("idx_keyof").toFile
    java.nio.file.Files.writeString(dir.toPath.resolve("a.parquet"), "x")
    val uri = s"file://${dir.getAbsolutePath}"
    val k1 = IndexStore.keyOf(uri)
    java.nio.file.Files.writeString(dir.toPath.resolve("b.parquet"), "y")
    val k2 = IndexStore.keyOf(uri)
    assert(k1 != k2,
      "an in-place corpus regeneration must change the key (stale-index guard), " +
        "including when the corpus is addressed by a Hadoop URI")
    // and the same dir addressed with vs without scheme sees the same inventory
    assert(IndexStore.keyOf(dir.getAbsolutePath) != k1, "path string participates in the key")
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
