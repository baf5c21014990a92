package graft.engine

import graft.functions.{Num, Status}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's core semantic: two-sided quantity reconciliation
  * (SURVEY.md §3.2 + §7.2; /root/reference/backend/main.py:458-532,
  * dags/dag_cardex_changes_to_bakery_system.py:51-105).
  *
  * Shape: aggregate each side to (key, total), full-outer join on the key,
  * classify each key with the epsilon ladder (P8 + F11).
  *
  * Scale notes: both aggregations are hash aggregates with map-side partial
  * combine, so the full-outer join shuffles only one pre-aggregated row per
  * key — at 100 TB the shuffle is proportional to key cardinality, not input
  * rows. No driver-side state.
  */
object Reconcile {
  /** Generic two-sided reconcile. Inputs are (key, value) pairs BEFORE
    * aggregation; values are summed in exact decimal. */
  def reconcile(
      left: DataFrame, leftKey: Column, leftVal: Column,
      right: DataFrame, rightKey: Column, rightVal: Column): DataFrame = {
    val l = left
      .groupBy(leftKey.as("k"))
      .agg(sum(Num.dec(leftVal)).as("jde_dec"))
    val r = right
      .groupBy(rightKey.as("k"))
      .agg(sum(Num.dec(rightVal)).as("ops_dec"))
    l.join(r, Seq("k"), "full_outer")
      .select(
        col("k"),
        Num.d(col("jde_dec")).as("jde_qty"),
        Num.d(col("ops_dec")).as("ops_qty"),
        Status.reconcileStatus(col("jde_dec"), col("ops_dec")).as("status"))
  }
}
