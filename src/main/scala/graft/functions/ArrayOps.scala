package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls. */
object ArrayOpsUtil {
  /** |distinct(a) ∩ distinct(b)| for string arrays — the value of
    * `size(array_intersect(a, b))` without materializing the intersection
    * array. A matched element is removed from the set, so duplicates on
    * either side never double-count (array_intersect's distinct
    * semantics); a null element matches a null element, as there. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    // probe with the smaller side to bound the hash set
    val (s, p, ns, np) = if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(s.getUTF8String(i)); i += 1 }
    var c = 0; var j = 0
    while (j < np && !set.isEmpty) {
      if (set.remove(p.getUTF8String(j))) c += 1
      j += 1
    }
    c
  }
}

/** Count of distinct common elements of two string arrays — equal to
  * `size(array_intersect(a, b))` but counting instead of building the
  * result array (one hash set sized by the smaller side, early exit once
  * every element is matched). On the Jaccard dedup hot path this is the
  * only thing the intersection is computed FOR; the built-in pair
  * allocates and copies the intersection just to take its length. */
case class IntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"intersect_count needs two array<string> inputs, " +
        s"got ${left.dataType} / ${right.dataType}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayOpsUtil.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayOpsUtil.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : IntersectCount = copy(left = l, right = r)
  override def prettyName: String = "intersect_count"
}

object ArrayOps {
  import org.apache.spark.sql.GraftColumnBridge

  /** |distinct(a) ∩ distinct(b)| — `size(array_intersect(a, b))`, counted. */
  def intersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
