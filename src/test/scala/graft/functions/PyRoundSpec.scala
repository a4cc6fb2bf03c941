package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PyRound.pyround

/** CPython-round semantics + the SQL registration via GraftExtensions. */
class PyRoundSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.local("2", "graft-pyround-test")
  import spark.implicits._

  test("pyround rounds the exact binary value, not the shortest repr") {
    // 0.685 is 0.68500000000000005… in binary → CPython round(0.685, 2) = 0.69
    // while Spark's bround(0.685, 2) = 0.68 (shortest-repr half-even)
    val r = Seq(0.685, 0.675, 2.5, -2.5, 0.5, 1.5).toDF("x")
      .select(pyround(col("x"), 2).as("p2"), pyround(col("x"), 0).as("p0"))
      .collect()
    assert(r(0).getDouble(0) == 0.69) // 0.685 stored above .685
    assert(r(1).getDouble(0) == 0.68) // 0.675 stored above .675 too
    assert(r(2).getDouble(1) == 2.0)  // banker's: 2.5 → 2
    assert(r(3).getDouble(1) == -2.0)
    assert(r(4).getDouble(1) == 0.0)  // 0.5 → 0
    assert(r(5).getDouble(1) == 2.0)  // 1.5 → 2
  }

  test("pyround runs inside whole-stage codegen") {
    val df = spark.range(100).select(pyround(col("id") / 7.0, 2).as("p"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      s"pyround projection fell out of codegen:\n$plan")
  }

  test("pyround is callable from SQL via GraftExtensions") {
    val got = spark.sql("SELECT pyround(0.685, 2) AS a, pyround(2.5) AS b").collect()(0)
    assert(got.getDouble(0) == 0.69)
    assert(got.getDouble(1) == 2.0)
  }
}
