package graft.functions

import graft.SparkSpec

import java.math.RoundingMode

/** F5-F7 byte-stability (SURVEY.md §7.4 risk #1): dispatch idempotency keys
  * are derived from normalized quantity strings, so the Spark rendering must
  * match the reference's Python `f"{Decimal:.9f}".rstrip('0').rstrip('.')`
  * for every representable input. Checked against a Scala model of the
  * Python behavior over a seeded random sample. */
class QuantitiesSpec extends SparkSpec {
  import spark.implicits._

  /** Scala model of utility.py:749-773: quantize to 9dp HALF_UP, render
    * fixed-point, strip trailing zeros then trailing dot. */
  private def pythonModel(d: BigDecimal): String = {
    val q = d.underlying.setScale(9, RoundingMode.HALF_UP)
    q.toPlainString.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
  }

  private def sparkNorm(values: Seq[String]): Seq[String] =
    values.toDF("q")
      .select(Quantities.normalizeQty($"q").as("n"))
      .collect().map(_.getString(0)).toSeq

  test("F6 normalize: canonical edge cases") {
    val in = Seq("1.500000000", "0.000000001", "100", "0", "-2.5", "-0.100",
      "123456789.987654321", "0.0000000005", "1e-3", "2.5e2")
    val expected = Seq("1.5", "0.000000001", "100", "0", "-2.5", "-0.1",
      "123456789.987654321", "0.000000001", "0.001", "250")
    assert(sparkNorm(in) === expected)
  }

  test("F6 normalize: matches Python model over 500 seeded random decimals") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(500) {
      BigDecimal(BigInt(rnd.nextLong() % 4000000000000L), rnd.nextInt(13))
    }
    val got = sparkNorm(samples.map(_.underlying.toPlainString))
    samples.zip(got).foreach { case (bd, g) =>
      assert(g === pythonModel(bd), s"input=$bd")
    }
  }

  test("F5 preserve precision: 9dp HALF_UP like Decimal.quantize") {
    val out = Seq("1.0000000014", "1.0000000015", "-1.0000000015")
      .toDF("q").select(Quantities.preservePrecision($"q").cast("string"))
      .collect().map(_.getString(0)).toSeq
    // HALF_UP: .0000000015 -> .000000002 away from zero on both signs
    assert(out === Seq("1.000000001", "1.000000002", "-1.000000002"))
  }

  test("F7 unique_transaction_id composition") {
    val df = Seq(("Flour", "L001", "V1", "2.500")).toDF("n", "l", "v", "q")
    val id = df.select(Quantities.uniqueTransactionId($"n", $"l", $"v", $"q"))
      .collect().head.getString(0)
    assert(id === "Flour_L001_V1_2.5")
  }

  test("F19 jsonSafe: NaN and both infinities null out, finite and null pass through") {
    val out = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -2.5).toDF("v")
      .unionByName(Seq.empty[Option[Double]].toDF("v")) // keep nullable type
      .unionByName(Seq(Option.empty[Double]).toDF("v"))
      .select(Quantities.jsonSafe($"v").as("s"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(out === Seq(None, None, None, Some(0.0), Some(-2.5), None))
  }
}
