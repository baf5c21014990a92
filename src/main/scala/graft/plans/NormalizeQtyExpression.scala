package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F6 `normalize_quantity_for_transaction_id` as a native Catalyst
  * expression with whole-stage codegen (SURVEY.md §2.10/§7.3: THE
  * candidate for a custom expression — dispatch idempotency keys must be
  * byte-identical everywhere, and this runs on every record of every
  * dispatch pipeline).
  *
  * Semantics (pinned to /root/reference/backend/utility.py:749-773):
  * quantize to 9 dp HALF_UP, render fixed-point (never scientific),
  * strip trailing zeros then a trailing dot. Single pass over a
  * java.math.BigDecimal — replaces the 6-expression chain in
  * [[graft.functions.Quantities.normalizeQty]] (abs/floor/mod/lpad/concat/
  * 2x regexp_replace), which allocates five intermediate strings per row.
  *
  * Known divergences from the reference (both deliberate — we format the
  * EXACT decimal, the reference goes through a Python float):
  *  - the reference's fallback path (utility.py:767) formats via a float
  *    round-trip `f"{float(x):.9f}"`: the value is first snapped to the
  *    nearest IEEE double, then printf rounds HALF_EVEN. For inputs that
  *    are exact 9-dp halfway points (e.g. 0.0000000005 → reference
  *    "0.000000001" or "0" depending on the double neighbor, ours always
  *    rounds half UP) and for quantities with more than ~15 significant
  *    digits (doubles can't hold them; we keep all digits the decimal
  *    carries), the rendered key differs. Inside the reference's own
  *    normal path (Decimal.quantize HALF_UP) we match exactly; the float
  *    path only triggers where the reference ALSO loses precision, so we
  *    treat the exact-decimal answer as the intended semantics rather
  *    than reproducing the double snap.
  *  - Python renders Decimal("-0") as "-0"; Java BigDecimal has no
  *    negative zero, so we emit "0".
  *
  * Input: any Decimal (casts upstream); output: UTF8String. Null-safe.
  */
case class NormalizeQtyExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeQtyExpression.normalize(input.asInstanceOf[Decimal]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.plans.NormalizeQtyExpression.normalize($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeQtyExpression {
  /** Shared by interpreted + codegen paths. */
  def normalize(d: Decimal): String = {
    val q = d.toJavaBigDecimal.setScale(9, java.math.RoundingMode.HALF_UP)
    val s = q.toPlainString
    // strip trailing zeros, then a trailing dot (python rstrip semantics;
    // the dot stops the zero-strip so integers keep their zeros)
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == '0') end -= 1
    if (end > 0 && s.charAt(end - 1) == '.') end -= 1
    s.substring(0, end)
  }
}
