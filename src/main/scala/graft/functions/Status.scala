package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Status-classification ladders (SURVEY.md §2.8 F11-F12, P8 epsilon). */
object Status {
  /** Reconciliation epsilon (dag_cardex_changes_to_bakery_system.py:86). */
  val Epsilon = 0.001

  /** F11 cardex status ladder (main.py:505-511) — ORDER-SENSITIVE:
    * Product Not Found -> Dispatched -> Partial Match -> Missing in Bakery Ops. */
  def cardexStatus(productFound: Column, dispatched: Column, partialMatch: Column): Column =
    when(!productFound, "Product Not Found")
      .when(dispatched, "Dispatched")
      .when(partialMatch, "Partial Match")
      .otherwise("Missing in Bakery Ops")

  /** F12 pivot match status (main.py:394-409). Quirk preserved: the
    * reference compares the two quantities as STRINGS, not numerically. */
  def matchStatus(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, "Missing Data")
      .when(a.cast("string") === b.cast("string"), "Match")
      .otherwise("Mismatch")

  /** P8/F11 reconciliation status over full-outer joined totals:
    * ops side missing -> "Product Not Found"; jde side missing ->
    * "Missing in JDE"; |diff| > epsilon -> "Mismatch"; else "Match". */
  def reconcileStatus(jdeQty: Column, opsQty: Column): Column =
    when(opsQty.isNull, "Product Not Found")
      .when(jdeQty.isNull, "Missing in JDE")
      .when(abs(jdeQty - opsQty) > Epsilon, "Mismatch")
      .otherwise("Match")
}
