package graft

/** Dev probe for the r11 `agg_*` bench-family drift (r11 verdict #2):
  * the family regressed 17.8 → 23.0 s (common-42 ratio 1.30) while
  * every later family held ≤1.16 and most improved — and none of the
  * movers were touched in r11. The family runs FIRST alphabetically,
  * and r11 raised the bench heap 8g → 32g with no -Xms: the JVM starts
  * at ~2g and G1 expands toward the 32g ceiling DURING the early
  * queries (page commit + zeroing + region resizing), costs the 8g run
  * never paid at that scale. This probe separates position from plan:
  * one JVM, the standard bench warm-up, then the agg family measured
  * TWICE back-to-back with bench semantics (n=5, min, clearCache
  * between queries). If pass 2 lands at r10's numbers while pass 1
  * reproduces the drift, the regression is JVM warm-up landing on
  * whichever family runs first — a measurement artifact, fixed by
  * committing the heap up front (-Xms/-XX:+AlwaysPreTouch) so the cost
  * moves to untimed JVM startup. Not part of the driver contract. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "5").toInt
    val spark = Sessions.local(cpus, appName = "graft-agg-probe")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // the bench's exact warm-up: entry + one untimed scan per table
    force(SparkEntry.entry(spark))
    Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "region" -> graft.sources.Tables.region, "nation" -> graft.sources.Tables.nation,
      "customer" -> graft.sources.Tables.customer, "supplier" -> graft.sources.Tables.supplier,
      "part" -> graft.sources.Tables.part, "orders" -> graft.sources.Tables.orders,
      "lineitem" -> graft.sources.Tables.lineitem, "events" -> graft.sources.Tables.events,
      "documents" -> graft.sources.Tables.documents, "embeddings" -> graft.sources.Tables.embeddings)
      .foreach { case (_, t) => force(t(spark, sfDir)) }
    Bench.jitWarmQueries.foreach { q =>
      SparkEntry.queries.get(q).foreach(fn => force(fn(spark, sfDir)))
    }
    val family = SparkEntry.queries.keys.toSeq.filter(_.startsWith("agg_")).sorted
      .filter(SparkEntry.oracleSql.contains)
    def pass(label: String): Map[String, Double] = {
      val out = family.flatMap { name =>
        val fn = SparkEntry.queries(name)
        val times = (1 to n).map { _ =>
          val t0 = System.nanoTime()
          force(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        Some(name -> times.min)
      }.toMap
      println(f"PASS $label total=${out.values.sum}%6.2f s over ${out.size} queries")
      out
    }
    val p1 = pass("first (bench position)")
    val p2 = pass("second (warm JVM)")
    family.foreach { q =>
      println(f"AGGPROBE $q%-28s pass1=${p1(q)}%6.2f pass2=${p2(q)}%6.2f ratio=${p1(q) / math.max(1e-9, p2(q))}%5.2f")
    }
    println(f"AGGPROBE TOTAL pass1=${p1.values.sum}%6.2f pass2=${p2.values.sum}%6.2f")
    spark.stop()
  }
}
