package graft

import org.apache.spark.sql.SparkSession

/** Single place to build correctly-configured local sessions.
  *
  * Settings that matter for correctness & scale:
  *  - `session.timeZone=UTC`: reference uses local-time epoch conversion
  *    (SURVEY §1.2); we pin UTC so hour/date derivations are reproducible.
  *  - `legacy.parquet.nanosAsLong=true`: tolerance for TIMESTAMP(NANOS)
  *    parquet (one historical testdata generation used it; the current
  *    data is TIMESTAMP_NTZ micros, which this flag doesn't affect).
  *    [[graft.sources.Tables.events]] branches on the scanned schema and
  *    handles both encodings.
  *  - shuffle partitions = cores for local runs (not the 200 default);
  *    on a real cluster this would be sized to data volume / AQE target.
  *  - AQE on: runtime coalescing + skew-join splitting at scale.
  */
object Sessions {
  def local(cpus: String, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
