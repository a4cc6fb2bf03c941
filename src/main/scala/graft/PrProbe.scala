package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev probe for the PageRank convergence loop: per-job wall times so
  * optimization lands on the dominant cost (edge build vs step jobs vs
  * probes). Not part of the driver contract. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-pr-probe")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = starts.get(je.jobId)
        if (t0 != 0L)
          println(f"JOB ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    force(graft.operators.Graph.pageRankConvergedSuppliers(spark, sfDir))
    println("=== WARM RUN JOBS ===")
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    force(graft.operators.Graph.pageRankConvergedSuppliers(spark, sfDir))
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
