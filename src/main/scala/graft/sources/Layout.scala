package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout levers beyond bucketing ([[Bucketing]]): Z-ORDER
  * clustering for multi-column data skipping, and small-file
  * COMPACTION. Neither changes query results — they change what a scan
  * has to READ, which at 100 TB is most of the cost.
  *
  * Z-order: parquet readers skip row groups / files whose column
  * min-max ranges miss the predicate. A table sorted on `x` alone has
  * tight `x` ranges but every file spans all of `y` — predicates on `y`
  * prune nothing. Interleaving the bits of both columns (the Morton
  * curve) gives every file a bounded 2-D tile, so min-max pruning works
  * on EITHER column — the standard multi-dimensional clustering move
  * for a fact table with more than one dominant predicate column.
  *
  * Compaction: streaming ingest and fine-grained partitioning produce
  * many small files; listing and opening them dominates scan cost long
  * before row groups do. Rewriting a directory into size-targeted files
  * (a coalesce — no shuffle) is the periodic maintenance job every
  * lakehouse table runs.
  */
object Layout {

  /** Morton (Z-curve) interleave of two non-negative int columns
    * (≤ 32 bits each): bit j of `a` lands at z-bit 2j, bit j of `b` at
    * 2j+1, via the classic spread-mask chain — five shift-and-mask
    * rounds per column, pure codegen'd long arithmetic. */
  def mortonCol(a: Column, b: Column): Column = {
    def spread(c: Column): Column = {
      val s1 = c.bitwiseOR(shiftleft(c, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val s4 = s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x3333333333333333L))
      s4.bitwiseOR(shiftleft(s4, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))
  }

  /** Write `df` Z-ordered on `(ca, cb)`: range-partition by the Morton
    * value into `files` output files, sort within each — every file
    * covers one contiguous Z range, i.e. a bounded tile in (ca, cb)
    * space, so min-max skipping prunes on either column. The range
    * partitioning is ONE shuffle at write time (same contract as
    * bucketing: pay layout once, prune forever). */
  def writeZOrdered(df: DataFrame, path: String,
                    ca: String, cb: String, files: Int): Unit =
    df.withColumn("_z", mortonCol(col(ca), col(cb)))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Deterministic Z-tile assignment over `lineitem (l_partkey,
    * l_suppkey)`: fixed-width tiles (`z >> 12`, i.e. 64×64 cells in key
    * space — NOT sampled range boundaries, so an external engine can
    * re-derive the exact same tiling), with per-tile row count and the
    * min/max of BOTH key columns. The per-tile min/max spans ARE the
    * data-skipping index a Z-ordered layout gives a scan: every tile is
    * bounded in both dimensions, so a predicate on either column alone
    * prunes. Oracle-gated as `rel_zorder_layout`. */
  def zTileStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      (col("l_partkey") % 1048576L).as("a"),
      (col("l_suppkey") % 1048576L).as("b"))
    li.withColumn("tile", shiftright(mortonCol(col("a"), col("b")), 12))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_rows"),
        min("a").as("a_lo"), max("a").as("a_hi"),
        min("b").as("b_lo"), max("b").as("b_hi"))
      .orderBy("tile")
  }

  /** Per-file min/max of a column over a written directory — the
    * data-skipping index a reader consults (parquet footers; derived
    * here via input_file_name so specs can measure layout quality). */
  def fileRanges(spark: SparkSession, path: String, c: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))

  /** Compact a parquet directory into ~`targetBytes` files: lists the
    * current files, computes the target file count from total bytes,
    * and rewrites via coalesce — a shuffle-free merge (skew-tolerant
    * enough for compaction; a full re-balance would be repartition).
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): (Int, Int) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(_.getPath.getName.endsWith(".parquet"))
    val bytes = parts.map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(n)
      .write.mode("overwrite").parquet(outPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(_.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }
}
