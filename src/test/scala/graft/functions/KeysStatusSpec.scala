package graft.functions

import graft.SparkSpec

/** F8-F13, F17-F18 key construction + F11/F12 status ladders, pinned to
  * the reference call sites cited in each function's doc. */
class KeysStatusSpec extends SparkSpec {
  import spark.implicits._

  test("F8 batch_name: null/empty lot -> bare name, else name_lot") {
    val out = Seq(("Flour", "L1"), ("Flour", null), ("Flour", ""))
      .toDF("p", "l").select(Keys.batchName($"p", $"l")).collect().map(_.getString(0)).toSeq
    assert(out === Seq("Flour_L1", "Flour", "Flour"))
  }

  test("F9 lot extraction strips one leading product_ prefix only") {
    val out = Seq(
      ("Flour_L1", "Flour"),      // strip -> L1
      ("Flour_Flour_L1", "Flour"),// strip once -> Flour_L1
      ("Sugar_L1", "Flour"))      // no prefix -> unchanged
      .toDF("b", "p").select(Keys.lotFromBatch($"b", $"p")).collect().map(_.getString(0)).toSeq
    assert(out === Seq("L1", "Flour_L1", "Sugar_L1"))
  }

  test("F10 business unit ladder: B_->1110 P_->1130 M_->1120 default 1110") {
    val out = Seq("B_x", "P_x", "M_x", "other")
      .toDF("n").select(Keys.businessUnit($"n")).collect().map(_.getString(0)).toSeq
    assert(out === Seq("1110", "1130", "1120", "1110"))
  }

  test("F17 truncation caps at 699 chars") {
    val long = "x" * 1000
    val out = Seq(long).toDF("s").select(Keys.truncateStatus($"s")).collect().head.getString(0)
    assert(out.length === 699)
  }

  test("F18 hash id is deterministic and in [0, 1e6)") {
    val out = Seq(1L, 42L, 999999999L).toDF("k")
      .select(Keys.hashId($"k")).collect().map(_.getLong(0)).toSeq
    assert(out === out.sorted.sortBy(x => out.indexOf(x))) // deterministic: re-evaluate equals
    assert(out.forall(v => v >= 0 && v < 1000000))
  }

  test("F11 cardex status ladder is order-sensitive") {
    val rows = Seq(
      (false, false, false), // not found wins first
      (true, true, true),    // dispatched beats partial
      (true, false, true),   // partial
      (true, false, false))  // fall-through
      .toDF("found", "disp", "part")
    val out = rows.select(Status.cardexStatus($"found", $"disp", $"part"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("Product Not Found", "Dispatched", "Partial Match", "Missing in Bakery Ops"))
  }

  test("F12 match status uses string equality (reference quirk)") {
    val out = Seq((Some(1.0), Some(1.0)), (Some(1.0), Some(2.0)), (None, Some(1.0)))
      .toDF("a", "b").select(Status.matchStatus($"a", $"b")).collect().map(_.getString(0)).toSeq
    assert(out === Seq("Match", "Mismatch", "Missing Data"))
  }

  test("P8 reconcile status: epsilon 0.001 boundary") {
    val out = Seq((Some(10.0), Some(10.0005)), (Some(10.0), Some(10.002)),
      (None, Some(1.0)), (Some(1.0), None))
      .toDF("j", "o").select(Status.reconcileStatus($"j", $"o")).collect().map(_.getString(0)).toSeq
    assert(out === Seq("Match", "Mismatch", "Missing in JDE", "Product Not Found"))
  }
}
