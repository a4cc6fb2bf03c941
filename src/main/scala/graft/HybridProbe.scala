package graft

object HybridProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", appName = "graft-hybrid-probe")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to 6).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"HPROBE $label%-24s " + ts.map(t => f"$t%5.2f").mkString(" "))
    }
    force(SparkEntry.entry(spark))
    time("bm25_leg")(force(graft.functions.TextAnalysis.bm25TopK(spark, sfDir, 5)))
    time("ann_leg")(force(graft.operators.Similarity.annMultiQueryTopK(spark, sfDir, 3L, 5)))
    time("hybrid_full")(force(graft.functions.TextAnalysis.hybridRrf(spark, sfDir)))
    spark.stop()
  }
}
