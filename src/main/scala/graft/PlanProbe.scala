package graft

/** Dev tool: print the formatted plan for a comma-separated list of
  * query names (arg 2) at a given scale dir (arg 1). Not a registered
  * query; used to audit new operators' physical plans interactively. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",")
    val spark = Sessions.local("4", appName = "graft-plan-probe")
    names.foreach { n =>
      val qe = SparkEntry.queries(n)(spark, dir).queryExecution
      println(s"\n===== $n =====")
      println(qe.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
