package graft

/** Dev probe: min-of-5 timing for the conf-scoped loop operators. */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", appName = "graft-loop-probe")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    force(SparkEntry.entry(spark))
    for (name <- Seq("rel_pagerank_converged", "rel_connected_components")) {
      val fn = SparkEntry.queries(name)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); force(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9
      }
      println(f"LPROBE $name%-28s min ${ts.min}%5.2f  " + ts.map(t => f"$t%5.2f").mkString(" "))
    }
    spark.stop()
  }
}
