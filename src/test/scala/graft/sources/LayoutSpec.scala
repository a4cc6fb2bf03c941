package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton interleave must match a bit-level
  * reference, and a Z-ordered table must let min-max skipping prune on
  * the SECOND column where a single-column sort cannot. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("4", "graft-layout-test")
  import spark.implicits._

  /** Bit-level reference interleave. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 32).foldLeft(0L) { (z, j) =>
      z | ((x >> j & 1L) << (2 * j)) | ((y >> j & 1L) << (2 * j + 1))
    }

  test("mortonCol matches the bit-level reference over a grid") {
    val pairs = for (x <- 0L to 40L; y <- 0L to 40L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .withColumn("z", Layout.mortonCol(col("x"), col("y")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for ((x, y) <- Seq((0L, 0L), (3L, 1L), (1023L, 0L), (0L, 1023L), (12345L, 54321L))) {
      val sdf = Seq((x, y)).toDF("x", "y")
        .withColumn("z", Layout.mortonCol(col("x"), col("y")))
        .collect().head.getLong(2)
      assert(sdf == mortonRef(x, y), s"($x,$y)")
    }
    pairs.foreach { case (x, y) => assert(got((x, y)) == mortonRef(x, y), s"($x,$y)") }
  }

  test("z-order prunes on the second column; single-column sort cannot") {
    // deterministic pseudo-uniform points in a 1024x1024 space — a real
    // bit-mixer, not two affine maps of i (those correlate mod 1024)
    val pts = (0L until 16384L).map { i =>
      val h = scala.util.hashing.MurmurHash3.stringHash(s"pt$i")
      ((h & 0x3FF).toLong, ((h >>> 10) & 0x3FF).toLong)
    }.toDF("x", "y")
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toString
    // (a) sorted by x only, 16 files
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$tmp/by_x")
    // (b) z-ordered on (x, y), 16 files
    Layout.writeZOrdered(pts, s"$tmp/by_z", "x", "y", files = 16)
    // min-max skipping for predicate y < 32: count files whose y-range
    // intersects — the reader's pruning decision, measured per file
    def overlapping(path: String): Long =
      Layout.fileRanges(spark, path, "y")
        .filter(col("lo") < 32).count()
    val linear = overlapping(s"$tmp/by_x")
    val zorder = overlapping(s"$tmp/by_z")
    assert(linear >= 15, s"x-sorted layout should be unprunable on y: $linear")
    assert(zorder <= linear / 2,
      s"z-order should bound each file's y-extent: $zorder vs $linear")
    // same rows either way — layout never changes semantics
    val a = spark.read.parquet(s"$tmp/by_x").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = spark.read.parquet(s"$tmp/by_z").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("compact merges a many-small-file directory to size-targeted files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    (1L to 4000L).toDF("v").repartition(40)
      .write.mode("overwrite").parquet(s"$tmp/small")
    val (before, after) = Layout.compact(spark, s"$tmp/small", s"$tmp/big",
      targetBytes = 1L << 20)
    assert(before == 40, s"setup should write 40 files, got $before")
    assert(after < before / 4, s"compaction should merge files: $before -> $after")
    // row-identical after the rewrite
    val a = spark.read.parquet(s"$tmp/small").collect().map(_.getLong(0)).sorted
    val b = spark.read.parquet(s"$tmp/big").collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq)
  }
}
