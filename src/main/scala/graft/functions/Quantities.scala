package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Quantity precision + transaction-identity scalar library
  * (SURVEY.md §2.8 F5-F7). These are correctness-critical: the reference
  * derives its exactly-once dispatch keys from normalized quantity strings,
  * so the normalization must be byte-stable.
  */
object Quantities {
  /** F5 `preserve_quantity_precision` (utility.py:776-807): quantize to
    * 9 dp, ROUND_HALF_UP. Spark's double->decimal cast rounds HALF_UP, so a
    * plain cast reproduces it; non-numeric input yields null (the reference
    * falls back to 0.0 — callers that need that wrap in coalesce). */
  def preservePrecision(q: Column): Column = Num.qty(q)

  /** F6 `normalize_quantity_for_transaction_id` (utility.py:749-773):
    * format at 9 dp fixed-point then strip trailing zeros and a trailing
    * dot — the Python `f"{q:.9f}".rstrip('0').rstrip('.')`.
    *
    * A plain decimal->string cast is NOT byte-stable: Java BigDecimal
    * renders |x| < 1e-6 in scientific notation ("1E-9"), Python/DuckDB
    * render plain. So we build the fixed-point string from exact integer
    * decimal arithmetic (all codegen'd, no UDF). Known divergence: Python
    * Decimal keeps a negative zero ("-0"); Java/Spark decimals have no -0,
    * so inputs in (-5e-10, 0) normalize to "0" not "-0".
    *
    * Oracle equivalent (DuckDB renders decimals plain):
    * rtrim(rtrim(CAST(CAST(x AS DECIMAL(38,9)) AS VARCHAR),'0'),'.'). */
  def normalizeQty(q: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.plans.NormalizeQtyExpression(GraftColumnBridge.expression(Num.qty(q))))
  }

  /** The same semantics as pure built-in expressions (used by the
    * NormalizeQtySpec cross-check; normalizeQty's native expression is the
    * production path — one BigDecimal pass instead of six chained
    * expressions and five intermediate strings per row). */
  def normalizeQtyBuiltins(q: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    val n = Num.qty(q)                                  // Decimal(38,9), HALF_UP
    val a = abs(n)
    val ip = floor(a).cast(DecimalType(29, 0)).cast("string")
    // Fraction via decimal MOD, which is precision-loss-free; a-floor(a)
    // or a*10^9 would exceed precision 38 and Spark would silently drop
    // low-order scale digits.
    val frac = (a % lit(1)).cast(DecimalType(10, 9))
    val fp9 = lpad((frac * lit(1000000000L)).cast(DecimalType(10, 0)).cast("string"), 9, "0")
    val full = concat(when(n < 0, lit("-")).otherwise(lit("")), ip, lit("."), fp9)
    regexp_replace(regexp_replace(full, "0+$", ""), "\\.$", "")
  }

  /** F7 `unique_transaction_id` = name_lot_vessel_normQty
    * (jde_helper.py:854-855, dags/dag_bakery_system_to_jde.py:184-190). */
  def uniqueTransactionId(name: Column, lot: Column, vessel: Column, qty: Column): Column =
    concat_ws("_", name, lot, vessel, normalizeQty(qty))

  /** F19 NaN/Inf sanitize (`safe_convert_value`, main.py:154-176): the
    * reference nulls NaN and ±Inf before JSON serialization. Codegen'd
    * expression — abs(c) = +Inf covers both infinities. */
  def jsonSafe(c: Column): Column =
    when(isnan(c) || abs(c) === Double.PositiveInfinity, lit(null)).otherwise(c)
}
