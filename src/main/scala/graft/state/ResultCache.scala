package graft.state

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The cross-run TTL'd result cache (SURVEY.md §2.8;
  * /root/reference/backend/utility.py:275-334 `retry_request_lru`,
  * :497-611 get/delete, :614-637 `invalidate_lru_cache`, :652-693
  * `cleanup_empty_cache_entries`, :696-747 `set_in_lru_cache`): response
  * documents keyed by the byte-stable F20 key ([[graft.functions.CacheKey]]),
  * read behind a TTL gate, invalidated after writes that stale them.
  *
  * Reference semantics preserved exactly (each a real call-site behavior,
  * not an accident of this rebuild):
  *  - **TTL read gate**: only rows with `created_at > now - ttl` are hits
  *    (utility.py:513-516 `timestamp > NOW() - INTERVAL '3600 seconds'`);
  *  - **first-writer-wins put**: `ON CONFLICT (cache_key) DO NOTHING`
  *    (utility.py:732-738) — a second put of a live key is a no-op. This
  *    extends to EXPIRED rows: the stale row blocks re-insertion until
  *    something deletes it (the reference never sweeps by age, only by
  *    emptiness), so an expired key stays a permanent miss until
  *    [[invalidate]]/[[cleanupEmpty]] clears it — quirk kept, documented;
  *  - **write-side normalization**: a single-element JSON array stores as
  *    its element (utility.py:723-726);
  *  - **self-healing reads**: a hit whose stored value is empty (`[]`) or
  *    unparseable JSON deletes the entry and reports a miss
  *    (utility.py:526-536);
  *  - **empty-entry sweep**: `cleanup_empty_cache_entries` deletes rows
  *    whose response is `[]`, `''`, or null (utility.py:661-666).
  *
  * Storage is the shared crash-safe [[Snapshots]] layout; "now" is an
  * explicit argument (deterministic specs, engine-wide rule). Scale shape:
  * the cache table is key-sized (one row per distinct request identity,
  * never data-sized); every operation is one snapshot read + at most one
  * publish, and [[get]] is a point lookup that at deploy scale sits behind
  * a Delta/Iceberg point read or an external KV — the API doesn't change.
  */
object ResultCache {
  private val schema = StructType.fromDDL(
    "cache_key STRING, response STRING, created_at TIMESTAMP")

  val DefaultTtlSeconds: Long = 3600L // utility.py:515

  def readAll(spark: SparkSession, dir: String): DataFrame =
    Snapshots.read(spark, dir, schema)

  /** `get_json_object(_, "$")` is null exactly when the string is not
    * parseable JSON — the same predicate the reference applies with
    * `json.loads` (utility.py:526-536). */
  private def isValidJson(c: org.apache.spark.sql.Column) =
    get_json_object(c, "$").isNotNull

  private def isEmptyMarker(c: org.apache.spark.sql.Column) =
    c.isNull || trim(c) === "" || regexp_replace(c, "\\s+", "") === "[]"

  /** Insert-if-absent (utility.py:732-738 ON CONFLICT DO NOTHING): the
    * stored row — live OR expired — wins over the incoming one. A
    * single-element JSON array normalizes to its element before storage
    * (utility.py:723-726). */
  def put(spark: SparkSession, dir: String, cacheKey: String, response: String,
          now: Timestamp): Unit = {
    import spark.implicits._
    // conflict probe first: ON CONFLICT DO NOTHING is a no-op WRITE in the
    // reference — blocked inserts must not rewrite the whole snapshot
    // (an expired tombstone would otherwise cost a full-table rewrite on
    // every put of its key)
    val existing = readAll(spark, dir).persist()
    try {
      if (existing.filter(col("cache_key") === cacheKey).isEmpty) {
        val incoming = Seq((cacheKey, response, now))
          .toDF("cache_key", "response", "created_at")
          .withColumn("response",
            when(json_array_length(col("response")) === 1,
              get_json_object(col("response"), "$[0]"))
              .otherwise(col("response")))
        Snapshots.publish(spark, dir, existing.unionByName(incoming))
      }
    } finally { existing.unpersist(); () }
  }

  /** The unexpired, non-empty, parseable response for `cacheKey`, if any.
    * A hit that is empty or invalid JSON is deleted on the way out and
    * reported as a miss — the reference's self-healing read
    * (utility.py:526-536). */
  def get(spark: SparkSession, dir: String, cacheKey: String,
          now: Timestamp, ttlSeconds: Long = DefaultTtlSeconds): Option[String] = {
    val cutoff = new Timestamp(now.getTime - ttlSeconds * 1000L)
    val hit = readAll(spark, dir)
      .filter(col("cache_key") === cacheKey && col("created_at") > lit(cutoff))
      .select(col("response"),
        (isEmptyMarker(col("response")) || !isValidJson(col("response")))
          .as("poisoned"))
      .collect()
      .headOption
    hit match {
      case Some(row) if row.getBoolean(1) => invalidate(spark, dir, cacheKey); None
      case Some(row)                      => Option(row.getString(0))
      case None                           => None
    }
  }

  /** Delete the entry for `cacheKey` (utility.py:548-611 delete /
    * :614-637 invalidate — the post-write staleness hook). Returns whether
    * a row was removed. */
  def invalidate(spark: SparkSession, dir: String, cacheKey: String): Boolean = {
    val all = readAll(spark, dir).persist()
    try {
      val n = all.filter(col("cache_key") === cacheKey).count()
      if (n > 0)
        Snapshots.publish(spark, dir, all.filter(col("cache_key") =!= cacheKey))
      n > 0
    } finally { all.unpersist(); () }
  }

  /** Drop rows whose stored response is empty — `[]`, `''`, or null
    * (utility.py:661-666). Returns the number removed. */
  def cleanupEmpty(spark: SparkSession, dir: String): Long = {
    val all = readAll(spark, dir).persist()
    try {
      val bad = all.filter(isEmptyMarker(col("response"))).count()
      if (bad > 0)
        Snapshots.publish(spark, dir, all.filter(!isEmptyMarker(col("response"))))
      bad
    } finally { all.unpersist(); () }
  }

  /** The cache-aside composition `retry_request_lru` wraps around GETs
    * (utility.py:295-331): hit → cached value; miss → `fetch`, and cache
    * the result only when it is non-empty (utility.py:322-329 — empty
    * responses are never cached). Returns (value, fromCache). */
  def getOrFetch(spark: SparkSession, dir: String, cacheKey: String,
                 now: Timestamp, ttlSeconds: Long = DefaultTtlSeconds)(
                 fetch: => Option[String]): (Option[String], Boolean) =
    get(spark, dir, cacheKey, now, ttlSeconds) match {
      case Some(v) => (Some(v), true)
      case None =>
        val fresh = fetch
        fresh match {
          case Some(v) if v.replaceAll("\\s+", "") != "[]" && v.trim.nonEmpty =>
            put(spark, dir, cacheKey, v, now)
          case _ => ()
        }
        (fresh, false)
    }
}
