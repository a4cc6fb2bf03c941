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

  /** Row count of a table from parquet FOOTER metadata — no data scan,
    * no Spark job: footers carry the per-row-group counts, which is what
    * a catalog serves as table statistics at 100 TB. Used by operators
    * that size themselves from the corpus count (e.g. auto-plane LSH).
    * None when the path isn't plain parquet (caller falls back to
    * count()). */
  def footerRowCount(spark: SparkSession, dir: String, name: String): Option[Long] =
    try {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = spark.sessionState.newHadoopConf()
      val root = new Path(s"$dir/$name.parquet")
      val fs = root.getFileSystem(conf)
      val status = fs.getFileStatus(root)
      val files =
        if (status.isDirectory)
          fs.listStatus(root).filter(_.getPath.getName.endsWith(".parquet"))
        else Array(status)
      var total = 0L
      files.foreach { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
        try total += r.getRecordCount
        finally r.close()
      }
      Some(total)
    } catch { case scala.util.control.NonFatal(_) => None }
}
