package graft.pipelines

import graft.engine.Reconcile
import graft.functions.{Keys, Status}
import graft.lake.LakeWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §3.2 — the reconciliation-and-dispatch pipeline (SURVEY.md;
  * /root/reference/backend/dags/dag_cardex_changes_to_bakery_system.py:
  * 41-105 and main.py:417-534): totals per product on both sides,
  * mismatch-only pruning BEFORE any expensive work, case-insensitive
  * product lookup, status ladder, RECEIVE_DRY_GOOD payloads for the
  * dispatchable subset, lake append.
  *
  * Scale shape: both sides pre-aggregate (shuffle = key cardinality),
  * the product dimension broadcasts, and the mismatch filter prunes the
  * work set before the lookup join — the reference applied the same
  * pruning manually for the same reason (§4.1).
  */
object CardexToOps {
  /** @param cardex  transaction rows: (item_name, qty)
    * @param products ops dimension: (productName, onHandAmount, archived) */
  def run(
      spark: SparkSession,
      cardex: DataFrame,
      products: DataFrame,
      lakeRoot: String,
      batchTs: String): DataFrame = {
    val live = products.filter(!col("archived"))                            // P4
    val recon = Reconcile.reconcile(
      cardex, lower(col("item_name")), col("qty"),
      live, lower(col("productName")), col("onHandAmount"))
    val mismatched = recon.filter(col("status") === "Mismatch" ||
      col("status") === "Product Not Found")                                // P8

    // J3: case-insensitive first-match lookup of the live product row
    import org.apache.spark.sql.expressions.Window
    val lookup = live
      .withColumn("k", lower(col("productName")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy("productName")))
      .filter(col("rn") === 1)
      .select(col("k"), col("productName"), col("onHandAmount"))

    val classified = mismatched
      .join(broadcast(lookup), Seq("k"), "left")
      .select(
        col("k"), col("jde_qty"), col("ops_qty"), col("status"),
        col("productName"),
        Status.cardexStatus(                                                 // F11
          col("productName").isNotNull,
          lit(false),
          col("status") === "Mismatch").as("dispatch_status"),
        (col("jde_qty") - coalesce(col("ops_qty"), lit(0.0))).as("delta_qty"))

    val payloads = classified
      .filter(col("dispatch_status") === "Partial Match" && col("delta_qty") > 0)
      .select(
        col("k"),
        lit("RECEIVE_DRY_GOOD").as("actionType"),                            // K6
        col("productName"),
        col("delta_qty").as("itemSize"),
        Keys.batchName(col("productName"),
          date_format(lit(batchTs).cast("timestamp"), "yyyyMMdd")).as("batch"), // F8
        concat(lit("JDE_Transaction_Id: "), col("k")).as("note"),            // F16/J6
        lit(batchTs).cast("timestamp").as("created_at"))

    LakeWriter.append(payloads, lakeRoot, "ops_dispatch", "created_at")      // K1
    classified
  }
}
