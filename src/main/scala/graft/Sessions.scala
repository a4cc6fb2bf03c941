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
/** Dedicated sessions for iterative loop operators (ADVICE r10): loops
  * want AQE off and data-sized reducer counts, and mutating the USER's
  * session conf for that is neither reentrant nor thread-safe. Each base
  * session gets ONE cached companion session (shared SparkContext +
  * shared external catalog, isolated SQLConf) created lazily — per-call
  * `newSession()` was measured at ~0.5 s/call of SessionState setup,
  * a 20-40% regression on the loop queries. User queries never run on
  * the companion, and loop bodies serialize on [[locked]], so its conf
  * mutations are private to exactly one loop at a time. */
object LoopSessions {
  private val cache = new java.util.WeakHashMap[SparkSession, SparkSession]
  def of(spark: SparkSession): SparkSession = synchronized {
    val got = cache.get(spark)
    if (got != null) got
    else {
      val s = spark.newSession()
      s.conf.set("spark.sql.adaptive.enabled", "false")
      cache.put(spark, s)
      s
    }
  }
  /** Serializes loop bodies: one loop owns the companion session's conf
    * at a time (the monitor is reentrant, so nested loop calls are safe). */
  def locked[T](body: => T): T = synchronized(body)
}

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
