package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over embedding arrays (float or double),
  * rounded to 6 dp — the hot scalar of the similarity-search operators.
  *
  * Bit-identical to the declarative formulation in
  * [[graft.functions.Vectors.cosine]] (cast-to-double per element, strictly
  * sequential left-fold sums, dot/(sqrt(na)*sqrt(nb)), then round): the
  * loop below performs the same double operations in the same order, so
  * swapping implementations cannot change a single output bit — which the
  * oracle compare and VectorsSpec both pin. One fused pass over the arrays
  * replaces zip_with+aggregate trees (interpreted, allocating an
  * intermediate array per row per pair).
  */
case class CosineSimilarityExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarityExpression.cosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.CosineSimilarityExpression.cosine($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimilarityExpression {
  /** Sequential-fold cosine; the operation order mirrors
    * aggregate(zip_with(a,b,*), 0.0, +) / (sqrt(agg(a*a)) * sqrt(agg(b*b))),
    * then round half-up at 6 dp (Spark's ROUND on double). */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val c = dot / (math.sqrt(na) * math.sqrt(nb))
    // mirror Spark's Round: NaN/Infinity pass through un-rounded
    if (c.isNaN || c.isInfinite) c
    else BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}
