package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.{IntersectCount, PyRound, QuantizedDot}

/** Engine extension point (SURVEY §7.3): registers graft's custom
  * Catalyst expressions with the session's FunctionRegistry so they are
  * callable from SQL. Enable via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (done by
  * [[graft.Sessions.local]]).
  *
  * Currently: `pyround(x, scale)` — CPython round semantics
  * ([[graft.functions.PyRound]], codegen'd).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def buildPyRound(args: Seq[Expression]): Expression = args match {
    case Seq(x) => PyRound(Cast(x, DoubleType), 0)
    case Seq(x, s) => s match {
      case Literal(i: Int, IntegerType) => PyRound(Cast(x, DoubleType), i)
      case _ => throw new IllegalArgumentException(
        "pyround scale must be an integer literal")
    }
    case _ => throw new IllegalArgumentException(
      s"pyround expects 1 or 2 arguments, got ${args.length}")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: native as-of join (logical node +
    // strategy + merge-pass physical operator, see [[AsOfJoin]])
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("pyround"),
      new ExpressionInfo(classOf[PyRound].getCanonicalName, "pyround"),
      (args: Seq[Expression]) => buildPyRound(args)))
    // quantized_dot(a, b) — codegen'd Σ round(aᵢ·1000)·round(bᵢ·1000)
    // (plain integer dot for array<bigint>); SQL registration makes it
    // usable inside higher-order-function lambdas too
    ext.injectFunction((
      FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getCanonicalName, "quantized_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => QuantizedDot(a, b)
        case _ => throw new IllegalArgumentException(
          s"quantized_dot expects 2 arguments, got ${args.length}")
      }))
    // intersect_count(a, b) — size(array_intersect(a, b)) without
    // materializing the intersection array
    ext.injectFunction((
      FunctionIdentifier("intersect_count"),
      new ExpressionInfo(classOf[IntersectCount].getCanonicalName, "intersect_count"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => IntersectCount(a, b)
        case _ => throw new IllegalArgumentException(
          s"intersect_count expects 2 arguments, got ${args.length}")
      }))
  }
}
