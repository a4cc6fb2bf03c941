package graft

/** Dev probe (r13): adjudicates the bench-context inflation of the
  * iterative graph queries — `rel_pagerank` benches at ~7 s min-of-5 at
  * position ~200 of the alphabetical sweep but runs ~2.7 s warm in an
  * isolated probe. Hypothesis: localCheckpoint RDD blocks leaked by the
  * ~1000 preceding query runs pin storage memory / old-gen heap until
  * the ContextCleaner's weak refs are processed, which needs a GC that
  * a 32 GiB pre-touched heap rarely performs (the cleaner's own
  * periodic GC defaults to 30 MIN — spark.cleaner.periodicGC.interval).
  *
  * Protocol: pagerank ×5 fresh → pollute (one pass of the checkpoint-
  * heavy families that precede it alphabetically, mimicking bench
  * order) → pagerank ×5 polluted → System.gc() + settle → pagerank ×5
  * post-GC. Storage block counts printed at each phase boundary. */
object LeakProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      appName = "graft-leak-probe")
    val sc = spark.sparkContext
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def storage(label: String): Unit = {
      val rdds = sc.getPersistentRDDs
      val infos = sc.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum / (1024.0 * 1024.0)
      val disk = infos.map(_.diskSize).sum / (1024.0 * 1024.0)
      println(f"STORAGE $label%-12s persistentRDDs=${rdds.size}%5d cached=${infos.length}%5d mem=${mem}%9.1f MB disk=${disk}%9.1f MB")
    }
    def run5(label: String, name: String): Unit = {
      val fn = SparkEntry.queries(name)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); force(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9
      }
      println(f"LEAKPROBE $label%-10s $name%-24s min=${ts.min}%5.2f  " +
        ts.map(t => f"$t%5.2f").mkString(" "))
    }
    force(SparkEntry.entry(spark))
    Bench.jitWarmQueries.foreach(q => force(SparkEntry.queries(q)(spark, sfDir)))
    storage("fresh")
    run5("fresh", "rel_pagerank")
    run5("fresh", "rel_pagerank_converged")
    storage("pre-pollute")
    // one pass of every dd_/rel_/mm_ query that precedes rel_pagerank
    // alphabetically (the bench gives each FIVE passes; one is a lower
    // bound on the pollution)
    val polluters = SparkEntry.queries.keys.toSeq.sorted.filter { q =>
      (q.startsWith("dd_") || q.startsWith("mm_") ||
        (q.startsWith("rel_") && q < "rel_pagerank")) && SparkEntry.oracleSql.contains(q)
    }
    polluters.foreach { q =>
      try {
        if (PinnedBaselines.skipReason(spark, sfDir, q).isEmpty)
          force(SparkEntry.queries(q)(spark, sfDir))
      } catch { case e: Throwable =>
        System.err.println(s"[leakprobe] polluter $q failed: ${e.getMessage}")
      }
    }
    try spark.catalog.clearCache() catch { case _: Throwable => () }
    storage("polluted")
    run5("polluted", "rel_pagerank")
    run5("polluted", "rel_pagerank_converged")
    storage("pre-gc")
    System.gc()
    Thread.sleep(3000)
    storage("post-gc")
    run5("post-gc", "rel_pagerank")
    run5("post-gc", "rel_pagerank_converged")
    spark.stop()
  }
}
