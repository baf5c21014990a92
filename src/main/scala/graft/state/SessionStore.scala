package graft.state

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * Storage reuses the [[DispatchState]] discipline: immutable `v-<n>/`
  * snapshots plus a tiny `CURRENT` pointer written last, so a crash at any
  * point leaves a complete previous snapshot — never a lost store. The
  * "current time" is an explicit argument instead of a wall-clock read:
  * that keeps every spec deterministic and is exactly how the lookback
  * predicates elsewhere in the engine treat time. At scale the snapshot
  * becomes a Delta/Iceberg table and `cleanup` a partition-drop on an
  * `expires_at` date partition; the API here doesn't change.
  *
  * Single-writer semantics, matching the reference's serialized API calls.
  */
object SessionStore {
  private val schema = StructType.fromDDL(
    "session_id STRING, payload STRING, created_at TIMESTAMP, expires_at TIMESTAMP")

  val DefaultTtlSeconds: Long = 3600L // session_helper.py:43 INTERVAL '1 hour'

  private val VersionDir = """v-(\d+)""".r

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def completeVersions(hfs: FileSystem, dir: String): Seq[Long] = {
    val base = new Path(dir)
    if (!hfs.exists(base)) Seq.empty
    else
      hfs.listStatus(base).toSeq.collect {
        case st if st.isDirectory =>
          st.getPath.getName match {
            case VersionDir(n) if hfs.exists(new Path(st.getPath, "_SUCCESS")) =>
              Some(n.toLong)
            case _ => None
          }
      }.flatten.sorted
  }

  private def currentVersion(hfs: FileSystem, dir: String): Option[Long] = {
    val ptr = new Path(s"$dir/CURRENT")
    val pointed =
      if (!hfs.exists(ptr)) None
      else {
        val in = hfs.open(ptr)
        try {
          scala.io.Source.fromInputStream(in).mkString.trim.toLongOption
            .filter(n => hfs.exists(new Path(s"$dir/v-$n/_SUCCESS")))
        } catch { case _: Exception => None }
        finally in.close()
      }
    pointed.orElse(completeVersions(hfs, dir).lastOption)
  }

  /** Every stored row, expired or not (the cleanup/audit view). */
  def readAll(spark: SparkSession, dir: String): DataFrame =
    currentVersion(fs(spark), dir) match {
      case Some(n) => spark.read.parquet(s"$dir/v-$n")
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

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
    publish(spark, dir,
      readAll(spark, dir)
        .filter(col("expires_at") > lit(now))
        .unionByName(incoming)
        .withColumn("rn", row_number().over(
          Window.partitionBy("session_id").orderBy(col("created_at").desc)))
        .filter(col("rn") === 1)
        .drop("rn"))
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
    val live = readAll(spark, dir).filter(col("expires_at") > lit(now))
    publish(spark, dir, live)
    readAll(spark, dir).count()
  }

  private def publish(spark: SparkSession, dir: String, snapshot: DataFrame): Unit = {
    val hfs = fs(spark)
    val cur = currentVersion(hfs, dir)
    val next = cur.getOrElse(0L) + 1
    snapshot.write.mode(SaveMode.Overwrite).parquet(s"$dir/v-$next")
    val out = hfs.create(new Path(s"$dir/CURRENT"), true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    completeVersions(hfs, dir)
      .filter(v => v != next && cur.forall(v < _))
      .foreach(v => hfs.delete(new Path(s"$dir/v-$v"), true))
  }
}
