package graft.state

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** K9 — the TTL'd session store (SURVEY.md §2.2;
  * /root/reference/backend/session_helper.py:29-95): a keyed JSON-document
  * store where every write stamps `created_at` and
  * `expires_at = created_at + 1 hour`, reads return only unexpired rows
  * (session_helper.py:115-118 `WHERE session_id = %s AND expires_at >
  * CURRENT_TIMESTAMP`), and a cleanup pass deletes expired rows
  * (session_helper.py:53-60 `cleanup_expired_sessions`). A re-put of an
  * existing key replaces the payload (UNIQUE session_id).
  *
  * Storage is the shared [[Snapshots]] crash-safe versioned layout. The
  * "current time" is an explicit argument instead of a wall-clock read:
  * that keeps every spec deterministic and is exactly how the lookback
  * predicates elsewhere in the engine treat time. At scale the snapshot
  * becomes a Delta/Iceberg table and `cleanup` a partition-drop on an
  * `expires_at` date partition; the API here doesn't change.
  */
object SessionStore {
  private val schema = StructType.fromDDL(
    "session_id STRING, payload STRING, created_at TIMESTAMP, expires_at TIMESTAMP")

  val DefaultTtlSeconds: Long = 3600L // session_helper.py:43 INTERVAL '1 hour'

  /** Every stored row, expired or not (the cleanup/audit view). */
  def readAll(spark: SparkSession, dir: String): DataFrame =
    Snapshots.read(spark, dir, schema)

  /** Store a payload under `sessionId`, replacing any existing row for the
    * key (session_helper.py:75-79 + the UNIQUE constraint at :41). Expired
    * rows are swept in the same snapshot write, mirroring the reference's
    * cleanup-before-insert call order (session_helper.py:64-68).
    */
  def put(spark: SparkSession, dir: String, sessionId: String, payload: String,
          now: Timestamp, ttlSeconds: Long = DefaultTtlSeconds): Unit = {
    import spark.implicits._
    val expires = new Timestamp(now.getTime + ttlSeconds * 1000L)
    val incoming = Seq((sessionId, payload, now, expires))
      .toDF("session_id", "payload", "created_at", "expires_at")
    // the incoming row must beat a stored row with the SAME created_at
    // (two puts inside one timestamp tick) — an explicit priority column
    // keeps the winner deterministic, per the engine-wide ordered-read rule
    Snapshots.publish(spark, dir,
      readAll(spark, dir)
        .filter(col("expires_at") > lit(now))
        .withColumn("__pri", lit(0))
        .unionByName(incoming.withColumn("__pri", lit(1)))
        .withColumn("rn", row_number().over(
          Window.partitionBy("session_id")
            .orderBy(col("created_at").desc, col("__pri").desc)))
        .filter(col("rn") === 1)
        .drop("rn", "__pri"))
  }

  /** The unexpired payload for `sessionId`, if any — the read gate
    * `expires_at > now` (session_helper.py:115-118). */
  def get(spark: SparkSession, dir: String, sessionId: String,
          now: Timestamp): Option[String] =
    readAll(spark, dir)
      .filter(col("session_id") === sessionId && col("expires_at") > lit(now))
      .select("payload")
      .collect()
      .headOption
      .map(_.getString(0))

  /** Drop every expired row (session_helper.py:53-60). Returns the number
    * of live sessions remaining. */
  def cleanup(spark: SparkSession, dir: String, now: Timestamp): Long = {
    // One read of the old snapshot: count the cached survivor set, then
    // publish from the same cache — not publish-then-re-read-and-count.
    val live = readAll(spark, dir).filter(col("expires_at") > lit(now)).persist()
    try {
      val n = live.count()
      Snapshots.publish(spark, dir, live)
      n
    } finally { live.unpersist(); () }
  }
}
