package graft

/** Dev probe: cold vs warm wall time for the slowest bench queries —
  * separates fixed per-query overhead (planning, codegen, AQE stage
  * setup) from actual compute so optimization effort lands on the right
  * side. Not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, appName = "graft-bench-probe")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    force(SparkEntry.entry(spark))
    val targets = args.toSeq match {
      case Nil => Seq("dd_jaccard_adjacent", "dd_minhash_lsh_pairs",
        "agg_approx_distinct", "rel_self_compare_crossnation", "sim_ivf_topk")
      case xs => xs
    }
    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-32s cold=${times(0)}%6.2f warm=${times(1)}%6.2f warm2=${times(2)}%6.2f")
    }
    spark.stop()
  }
}
