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
    * format at 9 dp then strip trailing zeros and a trailing dot.
    * DecimalType(38,9) always renders all 9 fraction digits, so two
    * regexp strips give exactly the Python `rstrip('0').rstrip('.')`.
    * Byte-stable across engines: the DuckDB oracle expression
    * rtrim(rtrim(CAST(x AS DECIMAL(38,9))::VARCHAR,'0'),'.') matches. */
  def normalizeQty(q: Column): Column =
    regexp_replace(regexp_replace(Num.qty(q).cast("string"), "0+$", ""), "\\.$", "")

  /** F7 `unique_transaction_id` = name_lot_vessel_normQty
    * (jde_helper.py:854-855, dags/dag_bakery_system_to_jde.py:184-190). */
  def uniqueTransactionId(name: Column, lot: Column, vessel: Column, qty: Column): Column =
    concat_ws("_", name, lot, vessel, normalizeQty(qty))
}
