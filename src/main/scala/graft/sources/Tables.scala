package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet readers for the driver-generated star schema (TESTDATA.md).
  *
  * Each reader is a plain `spark.read.parquet` scan: schemas come from
  * parquet footers, filters/projections issued downstream are pushed into
  * the scan by Catalyst (predicate pushdown + column pruning), so at
  * 100 TB the scan reads only the row groups / columns a query needs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * reads as nano-epoch long under `spark.sql.legacy.parquet.nanosAsLong`
    * (set in [[graft.Sessions]]). We expose both:
    *  - `ts`: proper TimestampType (micros; the data is micro-precision)
    *  - `ts_ns`: the raw long — time-range predicates written against it
    *    push down to the parquet scan, which the converted column cannot.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    table(spark, dir, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
