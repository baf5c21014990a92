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
  *    DuckDB TRY_CAST).
  */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)
