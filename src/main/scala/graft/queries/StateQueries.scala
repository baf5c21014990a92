package graft.queries

import graft.functions.CacheKey
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two operators SURVEY.md §2 scoped "out-of-engine" (K9 TTL'd session
  * store, F20 cache-key derivation), re-expressed as engine semantics so
  * the catalog covers the reference's full surface. The stateful store
  * itself lives in [[graft.state.SessionStore]] (spec-verified); these
  * queries pin the RELATIONAL semantics — TTL-gated latest-state reads and
  * byte-stable request hashing — against the DuckDB oracle.
  */
object StateQueries {

  val qs: Seq[Q] = Seq(
    Q(
      "k9_session_ttl",
      """K9 TTL'd session store semantics
        |(/root/reference/backend/session_helper.py:29-95): each writer key
        |is a session; the stored document is the LATEST payload
        |(UNIQUE session_id upsert), expires_at = last write + 1 hour, and
        |the read gate is `expires_at > now` (session_helper.py:115-118).
        |"now" is the table's max event time so the query is deterministic.
        |One shuffle on the session key shared by the window and the
        |aggregate; the one-row "now" side is a broadcast — scale-safe.""".stripMargin,
      Some(
        """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, props
          |           FROM events),
          |ranked AS (
          |  SELECT user_id, props,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM e),
          |agg AS (SELECT user_id, COUNT(*) AS n_writes, MAX(ts) AS last_write
          |        FROM e GROUP BY 1),
          |now_t AS (SELECT MAX(ts) AS now_ts FROM e)
          |SELECT a.user_id AS session_key,
          |       a.n_writes,
          |       a.last_write + INTERVAL 1 HOUR AS expires_at,
          |       r.props AS payload,
          |       (a.last_write + INTERVAL 1 HOUR > n.now_ts) AS live
          |FROM agg a
          |JOIN ranked r ON r.user_id = a.user_id AND r.rn = 1
          |CROSS JOIN now_t n
          |ORDER BY session_key""".stripMargin),
      (s, dir) => {
        val e = Tables.events(s, dir).select("user_id", "event_id", "ts", "props")
        // latest payload per session: deterministic (ts, event_id) order —
        // the engine-wide rule for ordered-sensitive reads (SURVEY §7.4.2)
        val latest = e
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("props").as("payload"))
        val agg = e.groupBy("user_id")
          .agg(count(lit(1)).as("n_writes"), max("ts").as("last_write"))
        val nowT = e.agg(max("ts").as("now_ts"))
        val expires = col("last_write") + expr("INTERVAL 1 HOUR")
        agg.join(latest, "user_id")
          .crossJoin(broadcast(nowT))
          .select(
            col("user_id").as("session_key"),
            col("n_writes"),
            expires.as("expires_at"),
            col("payload"),
            (expires > col("now_ts")).as("live"))
          .orderBy("session_key")
      }),

    Q(
      "f20_cache_key",
      """F20 cache-key derivation
        |(/root/reference/backend/utility.py:428-494): requests are
        |identified by sha256 over base_url || '||' || sorted-key compact
        |params JSON (values str-coerced) || '||' || payload JSON ('{}'
        |when absent). Derived per event from its type (URL path) and user
        |(param) — a pure scan-side projection, no shuffle except the
        |output-contract sort. Both engines build the identical byte
        |string, so the hex keys hash-match exactly.""".stripMargin,
      Some(
        """SELECT event_id,
          |       'https://ops.example/api/' || event_type AS base_url,
          |       sha256('https://ops.example/api/' || event_type || '||' ||
          |              to_json({size: CAST(1000 AS VARCHAR),
          |                       sort: 'ts:1',
          |                       uid: CAST(user_id AS VARCHAR)}) ||
          |              '||{}') AS cache_key
          |FROM events
          |ORDER BY event_id""".stripMargin),
      (s, dir) =>
        Tables.events(s, dir)
          .select(
            col("event_id"),
            concat(lit("https://ops.example/api/"), col("event_type")).as("base_url"),
            col("user_id"))
          .withColumn("cache_key", CacheKey.derive(
            col("base_url"),
            Seq(
              "uid" -> col("user_id"),
              "size" -> lit(1000),
              "sort" -> lit("ts:1"))))
          .select("event_id", "base_url", "cache_key")
          .orderBy("event_id")))
}
