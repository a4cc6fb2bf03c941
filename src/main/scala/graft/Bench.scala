package graft

/** Driver-run benchmark: one JSON line with per-query wall seconds on
  * SPARK_GRAFT_SF_DIR. Each query is forced with .count() after its own
  * transformations (aggregates/windows/joins all execute; nothing is
  * skipped by metadata-only shortcuts since every query ends in a
  * computed projection). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, appName = "graft-bench")
    // JVM/codegen warm-up on a tiny query so per-query numbers measure
    // the plan, not first-call JIT + codegen compile.
    SparkEntry.entry(spark).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
