package graft

/** Dev scale-stress runner (feeds SCALE.md, not part of the driver
  * contract): runs a named subset of SparkEntry.queries once (warm) and
  * prints per-query seconds — args: <sfDir> <name1,name2,...>.
  * Each query runs twice; the SECOND time is reported so numbers
  * measure the plan, not codegen compile + first-touch page cache. */
object Scale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, appName = "graft-scale")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    force(SparkEntry.entry(spark))
    val results = names.flatMap { name =>
      PinnedBaselines.skipReason(spark, sfDir, name) match {
        case Some(reason) =>
          println(s"SCALE-SKIP> $reason")
          None
        case None =>
          val fn = SparkEntry.queries(name)
          force(fn(spark, sfDir)) // warm (codegen + page cache)
          val t0 = System.nanoTime()
          force(fn(spark, sfDir))
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"SCALE> $name%-32s $sec%8.2f s")
          Some(name -> sec)
      }
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    println(s"""SCALEJSON> {"sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}
