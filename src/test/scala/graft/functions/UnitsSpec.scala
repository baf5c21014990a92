package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins F1-F4 behavior to the reference
  * (/root/reference/backend/utility.py:21-127), including the documented
  * quirks: unknown unit falls back to case-fold, unknown conversion pair
  * silently multiplies by 1.0. */
class UnitsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, in: Seq[String]): Seq[Any] =
    in.toDF("u").select(c).collect().map(_.get(0)).toSeq

  test("F1 convert_unit from JDE: mapped codes and lower-fallback") {
    val out = one(Units.convertUnitFromJde($"u"),
      Seq("KG", "kg", "EA", "LT", "GR", "ML", "M2", "PK", "ST", "FN", "XX", "Foo"))
    assert(out === Seq("kg", "kg", "each", "L", "g", "mL", "m2", "pack", "ST", "FN", "xx", "foo"))
  }

  test("F1 convert_unit to JDE: reverse map and upper-fallback") {
    val out = one(Units.convertUnitToJde($"u"), Seq("kg", "each", "L", "g", "mL", "pack", "zz"))
    assert(out === Seq("KG", "EA", "LT", "GR", "ML", "PK", "ZZ"))
  }

  test("F2 rate units both directions (to_jde quirk: lowercased lookup never hits)") {
    assert(one(Units.convertRateUnitFromJde($"u"), Seq("KG", "EA", "XX")) ===
      Seq("g/L", "each/L", "xx"))
    // Reference quirk (utility.py:106): reverse lookup uses unit.lower(),
    // but every reverse-map key contains an uppercase 'L' ("g/L"), so the
    // lookup ALWAYS misses and to_jde degenerates to upper(unit).
    assert(one(Units.convertRateUnitToJde($"u"), Seq("g/L", "each/L", "zz")) ===
      Seq("G/L", "EACH/L", "ZZ"))
  }

  test("F3 validate: known units pass any case, null/empty pass, junk fails") {
    val out = Seq(("KG"), ("kg"), ("bogus"), (""), (null))
      .toDF("u").select(Units.isValidUnit($"u")).collect().map(_.get(0)).toSeq
    assert(out === Seq(true, true, false, true, true))
  }

  test("F3 strict validation raises on invalid, passes valid through") {
    val ok = Seq("KG", "kg", "").toDF("u")
      .select(Units.validateUnitOrFail($"u")).collect().map(_.getString(0)).toSeq
    assert(ok === Seq("KG", "kg", ""))
    val e = intercept[Exception] {
      Seq("BOGUS").toDF("u").select(Units.validateUnitOrFail($"u")).collect()
    }
    assert(e.getMessage.contains("invalid unit") ||
      Option(e.getCause).exists(_.getMessage.contains("invalid unit")))
  }

  test("F4 convert_unit_quantity: identity, factor, silent-1.0 quirk") {
    val df = Seq(
      ("KG", "g", 2.5),   // mapped factor 1000
      ("KG", "KG", 3.0),  // identity after normalization
      ("kg", "KG", 3.0),  // case-normalizes to same -> identity
      // Reference quirk (utility.py:113-122): is_jde is EXACT-case, so "L"
      // normalizes to "l" and the ('L','ml') factor entry is unreachable ->
      // silent *1.0, NOT *1000.
      ("L", "ml", 1.5),
      ("XX", "yy", 7.0))  // unknown pair -> silent *1.0 (utility.py:119-122)
      .toDF("s", "t", "q")
    val out = df.select(Units.convertUnitQuantity($"s", $"t", $"q")).collect().map(_.getDouble(0)).toSeq
    assert(out === Seq(2500.0, 3.0, 3.0, 1.5, 7.0))
  }
}
