package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided Parquet tables (TESTDATA.md).
  *
  * These play the roles of the reference's sources (SURVEY.md §2.1):
  *  - `lineitem`/`orders`  — JDE Cardex transaction stream (S2)
  *  - `part`/`supplier`/`customer` — item-master / ops-product dims (S3, S4)
  *  - `events`             — the ADDITION action stream (S5, S6)
  *  - `documents`/`embeddings` — training-data pipeline extensions
  *
  * All reads are plain columnar Parquet scans: Catalyst pushes filters and
  * prunes columns (the reference always did `SELECT *`,
  * /root/reference/backend/main.py:120 — we explicitly do not).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong=true it arrives as long
    * nanoseconds, which we floor-truncate to a microsecond timestamp —
    * byte-identical to DuckDB's CAST(ts_ns AS TIMESTAMP). The raw nanos
    * stay exposed as `ts_ns`: predicates on the converted timestamp cannot
    * push past the conversion expression, but a bound on `ts_ns` reaches
    * the parquet scan and skips row groups — the difference between
    * scanning a day and scanning a year at 100 TB. */
  def events(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
