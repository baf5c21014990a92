package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The batch-inflation parity flag: default output preserves the
  * reference's quirk byte-for-byte (full qty on every batch row,
  * bakery_helper.py:524-526); `distributeQty = true` divides by the full
  * batch x vessel fan-out so per-INGREDIENT totals are conserved. */
class ActionFlattenerSpec extends SparkSpec {
  import spark.implicits._

  private def nested = Seq(
    ("a1", Seq(("i1", "Flour", 6.0,
      Seq(("Flour_B1", "L1"), ("Flour_B2", "L2"), ("Flour_B3", "L3")),
      Map("V1" -> 1.0, "V2" -> 2.0))))).toDF("action_id", "ingredients")
    .select(col("action_id"), expr(
      """transform(ingredients, i -> named_struct(
        |  'ingredient_id', i._1, 'name', i._2, 'qty', i._3,
        |  'batches', transform(i._4, b -> named_struct('batch_number', b._1, 'lot', b._2)),
        |  'additions', i._5))""".stripMargin).as("ingredients"))

  test("default preserves the inflation quirk (parity with the oracle)") {
    val out = ActionFlattener.flatten(nested)
    // 3 batches x 2 vessels = 6 rows, each carrying the FULL qty
    assert(out.count() === 6)
    assert(out.select(collect_set("qty")).first().getSeq[Double](0) === Seq(6.0))
    // inflated total: qty x batches x vessels
    assert(out.agg(sum("qty")).first().getDouble(0) === 36.0)
  }

  test("distributeQty=true conserves per-ingredient totals") {
    val out = ActionFlattener.flatten(nested, distributeQty = true)
    assert(out.count() === 6)
    // each row carries qty / (n_batches * n_vessels); summing ALL of the
    // ingredient's emitted rows returns its original qty — conservation
    // over the full batch x vessel fan-out, not just per vessel
    val perIngredient = out.groupBy("ingredient_id").agg(sum("qty").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(perIngredient === Map("i1" -> 6.0))
  }

  test("flag changes qty only — row set and other columns are identical") {
    val base = ActionFlattener.flatten(nested).drop("qty")
    val flagged = ActionFlattener.flatten(nested, distributeQty = true).drop("qty")
    assert(base.exceptAll(flagged).isEmpty && flagged.exceptAll(base).isEmpty)
  }
}
