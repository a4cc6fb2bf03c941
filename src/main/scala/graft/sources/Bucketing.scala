package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout: the "shuffle once at write time, join many
  * times for free" contract of a lakehouse fact table.
  *
  * Spark's bucketed scan reports the bucketing as its output
  * partitioning, so a join (or aggregation) keyed on the bucket columns
  * needs NO Exchange — `EnsureRequirements` sees the distribution already
  * satisfied. At 100 TB this is the difference between re-shuffling 6 B
  * lineitem rows on every orders⋈lineitem query and paying that shuffle
  * once at ingest: the standard layout decision for a fact table whose
  * dominant join key is known (here `orderkey`, the reference's
  * file-pair join key family — profiles ⋈ aggregates,
  * analyze_insta_enhanced.py:1092-1180).
  *
  * Buckets must be sized so one bucket ≈ one task's worth of data
  * (128-512 MB); both sides of a co-located join need the SAME bucket
  * count on the SAME key set.
  */
object Bucketing {

  /** Write `df` as an external parquet table bucketed AND sorted by
    * `keys` — sorted buckets additionally let the join skip its Sort
    * when the scan preserves the order. */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .saveAsTable(name)

  /** Write `df` hive-partitioned by `cols` (one directory per value) —
    * the layout move for low-cardinality predicate columns: a reader
    * filtering on them scans only the matching directories (partition
    * pruning — `PartitionFilters` in the scan, zero I/O for the rest).
    * Complements bucketing: partition by what you FILTER on, bucket by
    * what you JOIN on. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Per-order revenue over two tables pre-bucketed on the order key:
    * join AND aggregation run with ZERO exchanges — the scan's bucketing
    * satisfies both distribution requirements. `ordersTable` /
    * `lineitemTable` are catalog names written by [[writeBucketed]]. */
  def bucketedOrderRevenue(spark: SparkSession,
                           ordersTable: String = "orders_b",
                           lineitemTable: String = "lineitem_b"): DataFrame =
    spark.table(ordersTable)
      .join(spark.table(lineitemTable),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_custkey")
      .agg(
        count(lit(1)).as("n_items"),
        // decimal sum: order-independent across bucket layouts
        sum(col("l_quantity").cast("decimal(20,4)")).as("sum_qty"))
}
