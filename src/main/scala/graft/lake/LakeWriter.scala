package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K1 — the lake sink (SURVEY.md §2.2;
  * /root/reference/backend/s3_helper.py:29-75 `store_jde_dispatch`): every
  * dispatch/fetch/creation appended as Parquet under
  * `{root}/{recordType}/year=Y/month=M/day=D/`, which IS the audit trail /
  * bronze layer.
  *
  * Spark-first: `partitionBy("year","month","day")` writes the same
  * Hive-style layout the reference assembled by hand, and reads get
  * partition pruning free (S8's manual key-parsing listing,
  * s3_helper.py:101-154, becomes a `filter` on partition columns).
  * Scale: append-mode tasks write independently per partition — no
  * coordination, no driver bottleneck; object metadata (record_count)
  * becomes Parquet row-group stats.
  */
object LakeWriter {
  /** Append records to the lake under their event date (derived from
    * `tsCol`), Hive-partitioned year/month/day. */
  def append(df: DataFrame, root: String, recordType: String, tsCol: String): Unit =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .write.mode("append")
      .partitionBy("year", "month", "day")
      .parquet(s"$root/$recordType")

  /** Read a record type with an inclusive date-range filter — resolved by
    * partition pruning, never a full-lake scan (replaces S8's manual
    * listing+parse, s3_helper.py:136-140). */
  def readRange(spark: SparkSession, root: String, recordType: String,
                startDate: String, endDate: String): DataFrame =
    spark.read.parquet(s"$root/$recordType")
      .filter(make_date(col("year"), col("month"), col("day"))
        .between(lit(startDate).cast("date"), lit(endDate).cast("date")))
}
