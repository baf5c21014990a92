package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Morton (Z-order) bit interleave of the low 16 bits of two longs —
  * the curve-position kernel behind multi-dimensional data clustering
  * (`k_zorder_cluster`, lake `appendClustered` on a curve key).
  *
  * The declarative form is 2x16 chained div/mod/multiply terms (see
  * DataOpsQueries.mortonSql — kept as the oracle-shared twin and
  * bit-equivalence reference); this native kernel is five
  * shift-and-mask steps per operand (the standard magic-number bit
  * spread), codegen'd to straight-line Java. Negative inputs are
  * masked like the declarative form's non-negative contract: callers
  * pass bucketed non-negative keys (`pmod` upstream).
  *
  * Semantics: interleave(x, y) places bit i of x at position 2i and
  * bit i of y at position 2i+1, for i in [0, 16).
  */
case class MortonInterleaveExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  // any integral input; Java's implicit int->long widening covers the
  // codegen call, the eval path widens explicitly
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_morton expects integral arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def toLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MortonInterleaveExpression.interleave(toLong(a), toLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.MortonInterleaveExpression.interleave($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MortonInterleaveExpression {
  /** Spread the low 16 bits of v to even bit positions of a 32-bit lane. */
  private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}
