package graft.state

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** K4 + J5 — the exactly-once dispatch state (SURVEY.md §2.2/§2.4;
  * /root/reference/backend/jde_helper.py:1006-1023 `INSERT … ON CONFLICT
  * (unique_transaction_id) DO UPDATE`, probe at jde_helper.py:849-867):
  * a keyed status table consulted before dispatch (anti-join) and upserted
  * after (latest wins).
  *
  * No Delta in this environment, so MERGE is realized as the classic
  * Parquet pattern: read current state, union incoming, keep the
  * latest row per key (explicit `updated_at` then status order as the
  * version tiebreak), atomically swap directories. At scale the state
  * table is key-partitioned and the swap becomes a Delta/Iceberg MERGE —
  * the call sites don't change.
  *
  * Layout: `{dir}/current/` holds the live table; writes stage to
  * `{dir}/staging/` then promote. Single-writer semantics (one scheduled
  * pipeline instance), matching the reference's Airflow task model.
  */
object DispatchState {
  private val keyCol = "unique_transaction_id"

  def read(spark: SparkSession, dir: String): DataFrame = {
    val cur = new java.io.File(s"$dir/current")
    if (cur.exists())
      spark.read.parquet(cur.getPath)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          s"$keyCol STRING, status STRING, detail STRING, updated_at TIMESTAMP"))
  }

  /** J5: records not yet dispatched (status 'done' absent) — the
    * exactly-once gate. Broadcast the done-set when it is the small side. */
  def pending(records: DataFrame, spark: SparkSession, dir: String): DataFrame = {
    val done = read(spark, dir).filter(col("status") === "done").select(keyCol)
    records.join(done, Seq(keyCol), "left_anti")
  }

  /** K4: upsert new statuses, latest wins per key (updated_at desc, then
    * 'done' beats 'error' for identical timestamps, mirroring the
    * reference's DO UPDATE SET status='done'). */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame): Unit = {
    import org.apache.spark.sql.expressions.Window
    val merged = read(spark, dir)
      .unionByName(updates.select(col(keyCol), col("status"), col("detail"), col("updated_at")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(keyCol)
          .orderBy(col("updated_at").desc, (col("status") === "done").desc)))
      .filter(col("rn") === 1)
      .drop("rn")
    val staging = s"$dir/staging"
    val current = s"$dir/current"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val curPath = new org.apache.hadoop.fs.Path(current)
    if (fs.exists(curPath)) fs.delete(curPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), curPath)
  }
}
