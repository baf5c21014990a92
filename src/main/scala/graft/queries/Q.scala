package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over the test tables plus (when
  * SQL-expressible) the byte-equivalent DuckDB oracle SQL the driver
  * verifies against.
  *
  * Conventions that make the hash-compare deterministic across engines:
  *  - every aggregate runs in DecimalType (see [[graft.functions.Num]]) and
  *    outputs are cast to double with identical column aliases both sides;
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - error-prone casts use permissive semantics (Spark ANSI off ==
  *    DuckDB TRY_CAST);
  *  - any decimal cast to double must fit 15 significant digits AT THE
  *    TARGET SCALE FACTOR (digits of the unscaled value, magnitude x
  *    10^scale): beyond 2^53, DuckDB's int128->double conversion and
  *    Spark's correctly-rounded BigDecimal conversion can differ by 1 ulp.
  *    Grouped product-sums (scale 8) are the usual offender — ROUND to 4
  *    dp in BOTH engines before the cast (see a1's revenue);
  *  - integer SUMs in the oracle get CAST(... AS BIGINT) (DuckDB widens
  *    to HUGEINT, and the driver hashes typed values).
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)
