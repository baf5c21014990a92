package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's action-document flattener (SURVEY.md §2.8 generator
  * shape; /root/reference/backend/bakery_helper.py:453-563, 609-684):
  * one deeply nested action (ingredients[] x batches[] x vessel-additions
  * map) fans out to one row per (ingredient, batch, vessel-addition).
  *
  * Quirk preserved deliberately (bakery_helper.py:524-526 — "this might
  * need refinement"): the ingredient's FULL quantity is assigned to EVERY
  * batch of that ingredient, inflating totals by the batch count. Parity
  * first; a corrected variant would divide by `size(batches)`.
  *
  * Spark-first: the traversal is a chain of `explode` + `map_entries` —
  * Catalyst generators inside the scan stage, no UDF/flatMap, no shuffle.
  */
object ActionFlattener {
  /** Flatten nested actions with schema:
    * action_id, ingredients: array<struct<ingredient_id, name, qty,
    *   batches: array<struct<batch_number, lot>>,
    *   additions: map<vessel, qty>>>.
    *
    * @param distributeQty parity flag, default OFF = reference behavior
    *   (full per-ingredient qty repeated on every emitted row, inflating
    *   totals by the batch x vessel fan-out). ON divides qty by the FULL
    *   fan-out `size(batches) * size(additions)` so summing the emitted
    *   rows returns each ingredient's original qty exactly — the
    *   refinement the reference comment asks for, behind a flag per
    *   SURVEY's "parity first, fixes behind flags" rule. */
  def flatten(actions: DataFrame, distributeQty: Boolean = false): DataFrame = {
    val qtyOut =
      if (distributeQty) col("qty") / (col("n_batches") * col("n_adds"))
      else col("qty")
    actions
      .select(col("action_id"), explode(col("ingredients")).as("ing"))
      .select(
        col("action_id"),
        col("ing.ingredient_id").as("ingredient_id"),
        col("ing.name").as("ingredient_name"),
        col("ing.qty").as("qty"),
        size(col("ing.batches")).as("n_batches"),
        size(col("ing.additions")).as("n_adds"),
        explode(col("ing.batches")).as("batch"),
        col("ing.additions").as("additions"))
      .select(
        col("action_id"), col("ingredient_id"), col("ingredient_name"),
        col("batch.batch_number").as("batch_number"),
        col("batch.lot").as("lot"),
        explode(map_entries(col("additions"))).as("add"),
        col("qty"), col("n_batches"), col("n_adds"))
      .select(
        col("action_id"), col("ingredient_id"), col("ingredient_name"),
        col("batch_number"), col("lot"),
        col("add.key").as("vessel"),
        // default: full per-ingredient qty on every (batch, vessel) row —
        // the reference quirk, byte-identical to the oracle
        qtyOut.as("qty"))
  }
}
