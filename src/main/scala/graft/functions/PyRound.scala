package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static helper the generated code calls (Scala object ⇒ static
  * forwarders on the `PyRoundUtil` class, so codegen can reference it as
  * a plain Java static). */
object PyRoundUtil {
  def round(d: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else new java.math.BigDecimal(d)
      .setScale(scale, java.math.RoundingMode.HALF_EVEN).doubleValue()
}

/** Python-`round` semantics as a Catalyst expression.
  *
  * Spark's `round`/`bround` convert the double through its SHORTEST
  * decimal representation (`BigDecimal.valueOf`), so bround(0.685, 2)
  * sees exactly "0.685" and half-even ties to 0.68. CPython rounds the
  * EXACT binary value (0.68500000000000005…), giving 0.69. The reference
  * pipeline is full of `round(x, n)` calls whose goldens were produced by
  * CPython, so replicating its semantics needs `new BigDecimal(d)` (exact
  * expansion) + HALF_EVEN. Reference rounding sites:
  * analyze_insta_enhanced.py:445-447,451-452,458,526,531,1529,1543.
  *
  * Codegen: emits a static call into [[PyRoundUtil]], so the expression
  * stays inside whole-stage codegen (no interpreted fallback in the
  * report projection hot path).
  */
case class PyRound(child: Expression, scale: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    PyRoundUtil.round(v.asInstanceOf[Double], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PyRoundUtil.round($c, $scale)")
  override protected def withNewChildInternal(c: Expression): PyRound = copy(child = c)
  override def prettyName: String = "pyround"
}

object PyRound {
  import org.apache.spark.sql.GraftColumnBridge

  /** round(x, scale) with CPython semantics; input cast to double. */
  def pyround(c: Column, scale: Int): Column =
    GraftColumnBridge.column(PyRound(GraftColumnBridge.expression(c.cast("double")), scale))

  /** Python round(x) → int semantics (half-even on exact value). */
  def pyroundLong(c: Column): Column = pyround(c, 0).cast("long")
}
