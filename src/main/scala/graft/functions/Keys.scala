package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Key-construction scalar library (SURVEY.md §2.8 F8-F10, F13, F17, F18). */
object Keys {
  /** F8 `batch_name` (main.py:480-483, jde_helper.py:636-638):
    * lot null -> product name alone, else "name_lot". */
  def batchName(product: Column, lot: Column): Column =
    when(lot.isNull || lot === "", product).otherwise(concat_ws("_", product, lot))

  /** F9 lot extraction (jde_helper.py:888-897): strip a single leading
    * "product_" prefix from the batch number, else leave unchanged. */
  def lotFromBatch(batchNumber: Column, product: Column): Column = {
    val prefix = concat(product, lit("_"))
    when(batchNumber.startsWith(prefix),
      batchNumber.substr(length(prefix) + 1, length(batchNumber)))
      .otherwise(batchNumber)
  }

  /** F10 business-unit from name prefix (jde_helper.py:876-887):
    * B_ -> 1110, P_ -> 1130, M_ -> 1120, default 1110. */
  def businessUnit(name: Column): Column =
    when(name.startsWith("P_"), "1130")
      .when(name.startsWith("M_"), "1120")
      .otherwise("1110")

  /** F13 case-folded join/group key (main.py:468,476,486,813). */
  def caseKey(c: Column): Column = lower(c)

  /** F17 status-text truncation to 699 chars (jde_helper.py:1000). */
  def truncateStatus(c: Column): Column = substring(c, 1, 699)

  /** F18 compatibility product id (main.py:1993-1997 `hash(str) % 1000000`).
    * Python's hash is run-seeded, so we substitute a deterministic LCG mix —
    * engine-independent (expressible in ANSI SQL) by design. */
  def hashId(key: Column): Column =
    pmod(key.cast("long") * lit(1103515245L) + lit(12345L), lit(1000000L))
}
