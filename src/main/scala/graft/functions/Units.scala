package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unit-conversion scalar library (SURVEY.md §2.8 F1-F4).
  *
  * Pure column expressions over literal maps — no UDFs, so everything stays
  * inside whole-stage codegen and Catalyst can constant-fold where keys are
  * literal.
  *
  * Behavior pinned to the reference:
  *  - F1 `convert_unit`: JDE->lake map, unknown -> lower(unit); reverse map
  *    to JDE, unknown -> upper(unit). (/root/reference/backend/utility.py:21-35,93-99)
  *  - F2 `convert_rate_unit`: rate-unit map, same fallbacks. (utility.py:38-48,101-106)
  *  - F3 `validate_unit`: membership check; nulls/empty pass. (utility.py:50-75)
  *  - F4 `convert_unit_quantity`: case-normalize by JDE-membership, identity
  *    when equal, factor-table multiply, and the documented quirk that an
  *    UNKNOWN pair silently multiplies by 1.0. (utility.py:76-127)
  */
object Units {
  /** JDE unit -> lake unit (utility.py:21-33). */
  val unitMap: Map[String, String] = Map(
    "KG" -> "kg", "EA" -> "each", "LT" -> "L", "M2" -> "m2", "C2" -> "c2",
    "PK" -> "pack", "ST" -> "ST", "FN" -> "FN", "GR" -> "g", "ML" -> "mL")

  val reverseUnitMap: Map[String, String] = unitMap.map(_.swap)

  /** JDE rate unit -> lake rate unit (utility.py:38-46). */
  val rateUnitMap: Map[String, String] = Map(
    "KG" -> "g/L", "EA" -> "each/L", "LT" -> "mL/L",
    "M2" -> "m2/L", "C2" -> "c2/L", "PK" -> "pack/L")

  val reverseRateUnitMap: Map[String, String] = rateUnitMap.map(_.swap)

  /** Directed conversion factors; unknown pairs fall back to 1.0
    * (utility.py:76-91 — quirk preserved deliberately). */
  val conversionFactors: Map[(String, String), Double] = Map(
    ("KG", "g") -> 1000.0, ("KG", "L") -> 1.0, ("g", "KG") -> 0.001,
    ("L", "KG") -> 1.0, ("L", "ml") -> 1000.0, ("ml", "L") -> 0.001,
    ("EA", "EA") -> 1.0, ("each", "EA") -> 1.0, ("pack", "PK") -> 1.0,
    ("c2", "M2") -> 1.0, ("m2", "C2") -> 1.0,
    ("KG", "kg") -> 1.0, ("kg", "KG") -> 1.0)

  private val unitMapCol        = typedLit(unitMap)
  private val reverseUnitMapCol = typedLit(reverseUnitMap)
  private val rateMapCol        = typedLit(rateUnitMap)
  private val reverseRateCol    = typedLit(reverseRateUnitMap)
  // (src, tgt) keyed as "src|tgt" since map literals need scalar keys.
  private val factorsCol = typedLit(conversionFactors.map { case ((a, b), f) => s"$a|$b" -> f })

  /** F1, direction=from_jde: map upper(unit), unknown -> lower(unit). */
  def convertUnitFromJde(unit: Column): Column =
    coalesce(element_at(unitMapCol, upper(unit)), lower(unit))

  /** F1, direction=to_jde: reverse map (exact, then lowercased key), unknown -> upper. */
  def convertUnitToJde(unit: Column): Column =
    coalesce(element_at(reverseUnitMapCol, unit),
             element_at(reverseUnitMapCol, lower(unit)),
             upper(unit))

  /** F2 from_jde. */
  def convertRateUnitFromJde(unit: Column): Column =
    coalesce(element_at(rateMapCol, upper(unit)), lower(unit))

  /** F2 to_jde. */
  def convertRateUnitToJde(unit: Column): Column =
    coalesce(element_at(reverseRateCol, lower(unit)), upper(unit))

  /** F3: true iff unit is valid (null/empty pass, like the reference). */
  def isValidUnit(unit: Column): Column =
    unit.isNull || unit === "" || upper(unit).isin(unitMap.keys.toSeq: _*)

  /** F3 strict form (utility.py:50-75 raises ValueError): fail the job on
    * the first invalid unit, identifying it in the error. For a
    * dead-letter channel instead, filter on [[isValidUnit]]'s negation. */
  def validateUnitOrFail(unit: Column): Column =
    when(isValidUnit(unit), unit)
      .otherwise(raise_error(concat(lit("invalid unit: "), unit)))

  /** Membership in the JDE unit set (utility.py:106 `is_jde`). */
  def isJde(unit: Column): Column = unit.isin(unitMap.keys.toSeq: _*)

  private def normalizeCase(unit: Column): Column =
    when(isJde(unit), upper(unit)).otherwise(lower(unit))

  /** F4 `convert_unit_quantity` — identity when normalized units equal,
    * else factor-table multiply with silent x1.0 for unknown pairs. */
  def convertUnitQuantity(srcUnit: Column, tgtUnit: Column, quantity: Column): Column = {
    val s = normalizeCase(srcUnit)
    val t = normalizeCase(tgtUnit)
    val factor = coalesce(element_at(factorsCol, concat(s, lit("|"), t)), lit(1.0))
    when(s === t, quantity.cast("double"))
      .otherwise(quantity.cast("double") * factor)
  }
}
