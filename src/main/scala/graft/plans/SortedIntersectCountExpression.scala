package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Count of common elements between two SORTED-ascending distinct long
  * arrays — the inner kernel of the pairwise set-similarity operators
  * (n-gram Jaccard, shingle overlap).
  *
  * `array_intersect` allocates a boxed hash set per invocation; at a
  * million candidate pairs x ~100-element shingle sets that is ~10^8
  * boxed longs per query run, and its GC pressure made the dedup bench
  * swing by an order of magnitude run-to-run. This merge walk reads both
  * primitive arrays in place: zero allocation, O(|a|+|b|), codegen'd.
  *
  * Callers must pre-sort (`array_sort(array_distinct(...))`) — cost
  * amortized once per document, not once per pair.
  */
case class SortedIntersectCountExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountExpression.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.SortedIntersectCountExpression.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCountExpression {
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
