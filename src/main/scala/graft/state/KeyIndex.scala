package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Persistent key index for incremental (cross-run) dedup: the set of
  * content keys ever ingested, consulted by each new batch (anti-join)
  * and extended with the batch's new keys afterwards — the stateful twin
  * of the `dd_incremental` catalog query and the corpus-side analog of
  * [[DispatchState]]'s exactly-once gate.
  *
  * Layout is the shared [[Snapshots]] crash-safe versioned layout; the
  * stored frame is key-sized (one string key + first-seen batch id per
  * row), never corpus-sized. At 100 TB the snapshot becomes a table
  * bucketed by key so the per-batch anti-join shuffles only the incoming
  * batch (see BucketedJoinSpec for the zero-shuffle join shape).
  */
object KeyIndex {
  private val schema = StructType.fromDDL("key STRING, first_batch LONG")

  def read(spark: SparkSession, dir: String): DataFrame =
    Snapshots.read(spark, dir, schema)

  /** Rows of `batch` whose `keyCol` is NOT yet in the index — the
    * incremental-dedup survivors. */
  def newRows(batch: DataFrame, keyCol: String, spark: SparkSession,
              dir: String): DataFrame =
    batch.join(
      read(spark, dir).select(col("key").as(keyCol)),
      Seq(keyCol), "left_anti")

  /** Fold `keys` (a one-column frame of new keys) into the index under
    * `batchId`. First writer wins per key — replaying a batch after a
    * crash cannot re-claim or duplicate keys. */
  def add(spark: SparkSession, dir: String, keys: DataFrame,
          batchId: Long): Unit = {
    val incoming = keys.toDF("key").distinct()
      .select(col("key"), lit(batchId).as("first_batch"))
    Snapshots.publish(spark, dir,
      read(spark, dir)
        .unionByName(incoming)
        .groupBy("key")
        .agg(min("first_batch").as("first_batch")))
  }
}
