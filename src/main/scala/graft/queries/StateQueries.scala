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
  * byte-stable request hashing — against the DuckDB oracle. The third
  * entry, `k_snapshot_diff`, is the CDC companion to the K4 upsert store:
  * the changefeed between two snapshot states, derived in ONE pass.
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
          .orderBy("event_id")),

    Q(
      "k_snapshot_diff",
      """CDC snapshot diff — the changefeed between two versions of a
        |"latest purchase per active user" dimension (the K4 upsert
        |store's table-diff twin, the shape behind lakehouse time-travel
        |`table_changes(v1, v2)`). State at a cutoff = the latest purchase
        |(deterministic (ts, event_id) order) within the 7-day activity
        |window before it; diffing the 2024-01-15 and 2024-01-31 cutoffs
        |yields per-user verdicts: added (newly active), removed (went
        |inactive), changed/unchanged (value comparison). Values are
        |floor-micro integers so both engines compare identical bigints.
        |Scale shape: NO self-join of the two snapshots — one scan with
        |the two windows' union pushed as a filter, then a single
        |user-key aggregate computes both states at once via conditional
        |struct-max (map-side combinable; the shuffle carries two structs
        |per user, not events). At 100 TB this is one exchange on the
        |user key vs the naive plan's two windows + full-outer join.""".stripMargin,
      Some(
        """WITH p AS (
          |  SELECT user_id, event_id, ts,
          |         CAST(floor(value * 1000000) AS BIGINT) AS vmicro
          |  FROM events
          |  WHERE event_type = 'purchase'
          |    AND ((ts > TIMESTAMP '2024-01-08 00:00:00'
          |          AND ts <= TIMESTAMP '2024-01-15 00:00:00')
          |      OR (ts > TIMESTAMP '2024-01-24 00:00:00'
          |          AND ts <= TIMESTAMP '2024-01-31 00:00:00'))),
          |s AS (
          |  SELECT user_id,
          |         max(CASE WHEN ts <= TIMESTAMP '2024-01-15 00:00:00'
          |                  THEN {'ts': ts, 'eid': event_id, 'v': vmicro} END) AS s1,
          |         max(CASE WHEN ts >  TIMESTAMP '2024-01-15 00:00:00'
          |                  THEN {'ts': ts, 'eid': event_id, 'v': vmicro} END) AS s2
          |  FROM p GROUP BY user_id)
          |SELECT user_id,
          |       CASE WHEN s1 IS NULL THEN 'added'
          |            WHEN s2 IS NULL THEN 'removed'
          |            WHEN s1.v = s2.v THEN 'unchanged'
          |            ELSE 'changed' END AS verdict,
          |       s1.v AS v1_micro, s2.v AS v2_micro,
          |       s1.eid AS e1_id, s2.eid AS e2_id
          |FROM s
          |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val t1 = "TIMESTAMP '2024-01-15 00:00:00'"
        val p = Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            ((col("ts") > expr("TIMESTAMP '2024-01-08 00:00:00'") &&
              col("ts") <= expr(t1)) ||
             (col("ts") > expr("TIMESTAMP '2024-01-24 00:00:00'") &&
              col("ts") <= expr("TIMESTAMP '2024-01-31 00:00:00'"))))
          .select(col("user_id"), col("event_id"), col("ts"),
            floor(col("value") * 1000000L).cast("long").as("vmicro"))
        // conditional struct-max: (ts, event_id) is the deterministic
        // latest-order; vmicro rides as the third field (never compared —
        // (ts, event_id) is unique)
        val snap = p.groupBy("user_id").agg(
          max(when(col("ts") <= expr(t1),
            struct(col("ts"), col("event_id").as("eid"), col("vmicro").as("v"))))
            .as("s1"),
          max(when(col("ts") > expr(t1),
            struct(col("ts"), col("event_id").as("eid"), col("vmicro").as("v"))))
            .as("s2"))
        snap.select(
            col("user_id"),
            when(col("s1").isNull, lit("added"))
              .when(col("s2").isNull, lit("removed"))
              .when(col("s1.v") === col("s2.v"), lit("unchanged"))
              .otherwise(lit("changed")).as("verdict"),
            col("s1.v").as("v1_micro"), col("s2.v").as("v2_micro"),
            col("s1.eid").as("e1_id"), col("s2.eid").as("e2_id"))
          .orderBy("user_id")
      }),

    Q(
      "k_cdc_apply_roundtrip",
      """MERGE-apply round-trip proof — the other half of the CDC story
        |(k_snapshot_diff derives a changefeed; this query APPLIES one
        |and proves the apply operator correct): base = latest purchase
        |per user at the 01-15 cutoff, delta batch = each user's latest
        |in (01-15, 01-31], merge = full-outer upsert (delta wins, base
        |carries), target = the directly-computed 01-31 snapshot. The
        |output row carries the merge's action counts (insert / update /
        |carry) AND the mismatch count vs target — 0 by the upsert
        |identity, and the oracle hash turns any drift in merge
        |semantics into a red row. Every snapshot is one user-key
        |struct-max aggregate (map-side combinable); the merge and the
        |comparison are user-key joins on snapshot-sized frames, so at
        |100 TB the expensive part stays the scans, never the apply.""".stripMargin,
      Some(
        """WITH base AS (
          |  SELECT user_id,
          |         max({'ts': ts, 'eid': event_id,
          |              'v': CAST(floor(value * 1000000) AS BIGINT)}) AS st
          |  FROM events
          |  WHERE event_type = 'purchase'
          |    AND ts <= TIMESTAMP '2024-01-15 00:00:00'
          |  GROUP BY user_id),
          |delta AS (
          |  SELECT user_id,
          |         max({'ts': ts, 'eid': event_id,
          |              'v': CAST(floor(value * 1000000) AS BIGINT)}) AS st
          |  FROM events
          |  WHERE event_type = 'purchase'
          |    AND ts > TIMESTAMP '2024-01-15 00:00:00'
          |    AND ts <= TIMESTAMP '2024-01-31 00:00:00'
          |  GROUP BY user_id),
          |target AS (
          |  SELECT user_id,
          |         max({'ts': ts, 'eid': event_id,
          |              'v': CAST(floor(value * 1000000) AS BIGINT)}) AS st
          |  FROM events
          |  WHERE event_type = 'purchase'
          |    AND ts <= TIMESTAMP '2024-01-31 00:00:00'
          |  GROUP BY user_id),
          |merged AS (
          |  SELECT COALESCE(d.user_id, b.user_id) AS user_id,
          |         COALESCE(d.st, b.st) AS st,
          |         CASE WHEN b.user_id IS NULL THEN 'insert'
          |              WHEN d.user_id IS NULL THEN 'carry'
          |              ELSE 'update' END AS action
          |  FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id),
          |cmp AS (
          |  SELECT m.action,
          |         CASE WHEN m.st.eid IS DISTINCT FROM t.st.eid
          |                OR m.st.v IS DISTINCT FROM t.st.v
          |              THEN 1 ELSE 0 END AS mism
          |  FROM merged m FULL OUTER JOIN target t ON m.user_id = t.user_id)
          |SELECT CAST(COUNT(*) AS BIGINT) AS n_target,
          |       CAST(COUNT(*) FILTER (WHERE action = 'insert') AS BIGINT)
          |         AS n_inserts,
          |       CAST(COUNT(*) FILTER (WHERE action = 'update') AS BIGINT)
          |         AS n_updates,
          |       CAST(COUNT(*) FILTER (WHERE action = 'carry') AS BIGINT)
          |         AS n_carries,
          |       CAST(SUM(mism) AS BIGINT) AS n_mismatch
          |FROM cmp
          |ORDER BY n_target""".stripMargin),
      (s, dir) => {
        def snap(lo: Option[String], hi: String) = {
          val base = Tables.events(s, dir)
            .filter(col("event_type") === "purchase" &&
              col("ts") <= expr(s"TIMESTAMP '$hi'"))
          lo.fold(base)(l => base.filter(col("ts") > expr(s"TIMESTAMP '$l'")))
            .groupBy("user_id")
            .agg(max(struct(col("ts"), col("event_id").as("eid"),
              floor(col("value") * 1000000L).cast("long").as("v"))).as("st"))
        }
        val c1 = "2024-01-15 00:00:00"; val c2 = "2024-01-31 00:00:00"
        val base = snap(None, c1)
        val delta = snap(Some(c1), c2)
        val target = snap(None, c2)
          .select(col("user_id"), col("st").as("tst"))
        val merged = base.select(col("user_id").as("bu"), col("st").as("bst"))
          .join(delta.select(col("user_id").as("du"), col("st").as("dst")),
            col("bu") === col("du"), "full_outer")
          .select(
            coalesce(col("du"), col("bu")).as("user_id"),
            coalesce(col("dst"), col("bst")).as("st"),
            when(col("bu").isNull, lit("insert"))
              .when(col("du").isNull, lit("carry"))
              .otherwise(lit("update")).as("action"))
        merged.join(target, Seq("user_id"), "full_outer")
          .select(col("action"),
            when(expr("not (st.eid <=> tst.eid)") ||
                 expr("not (st.v <=> tst.v)"), 1L).otherwise(0L).as("mism"))
          .agg(
            count(lit(1)).as("n_target"),
            sum(when(col("action") === "insert", 1L).otherwise(0L)).as("n_inserts"),
            sum(when(col("action") === "update", 1L).otherwise(0L)).as("n_updates"),
            sum(when(col("action") === "carry", 1L).otherwise(0L)).as("n_carries"),
            sum(col("mism")).as("n_mismatch"))
          .orderBy("n_target")
      }),

    Q(
      "k_fifo_costing",
      """FIFO inventory valuation — the ledger semantics behind an ERP
        |cardex (the reference's inventory movements are exactly such a
        |ledger): receipts per part consume in ship-date order, 60% of each
        |part's received quantity is issued, and cost of goods issued is
        |allocated layer by layer. The classic formulation iterates the
        |layers per issue; the scale formulation here is the running-sum
        |interval intersection — each receipt layer occupies
        |[cum_end-qty, cum_end) of the part's cumulative axis, the issued
        |total occupies [0, issued), and the consumed overlap is
        |GREATEST(0, LEAST(cum_end, issued)-(cum_end-qty)) — one window
        |pass, no iteration. All arithmetic is integer (quantities are
        |integral; costs in cents; layer cost prorated with truncating
        |div, identical to DuckDB's //), so the oracle is hash-exact at
        |any scale. One l_partkey shuffle serves both windows AND the
        |per-part rollup; the brand dimension rides broadcast.""".stripMargin,
      Some(
        """WITH r AS (
          |  SELECT l_partkey,
          |         CAST(l_quantity AS BIGINT) AS qty,
          |         CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cost_c,
          |         CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey
          |              ORDER BY l_shipdate, l_orderkey, l_linenumber
          |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_end,
          |         CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey) AS BIGINT) AS total_qty
          |  FROM lineitem),
          |a AS (
          |  SELECT l_partkey, qty, cost_c, cum_end, total_qty,
          |         (3 * total_qty) // 5 AS issued
          |  FROM r),
          |f AS (
          |  SELECT l_partkey,
          |         MAX(total_qty) AS total_qty,
          |         MAX(issued) AS issued,
          |         CAST(SUM((cost_c * GREATEST(0, LEAST(cum_end, issued) - (cum_end - qty))) // qty) AS BIGINT) AS cogs_c
          |  FROM a
          |  GROUP BY l_partkey)
          |SELECT p_brand,
          |       COUNT(*) AS n_parts,
          |       CAST(SUM(issued) AS BIGINT) AS issued_qty,
          |       CAST(SUM(cogs_c) AS BIGINT) AS cogs_cents,
          |       CAST(SUM(total_qty - issued) AS BIGINT) AS remaining_qty
          |FROM f JOIN part ON p_partkey = l_partkey
          |GROUP BY p_brand
          |ORDER BY p_brand""".stripMargin),
      (s, dir) => {
        import graft.functions.Num.dec
        val wOrd = Window.partitionBy("l_partkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("l_partkey")
        val layers = Tables.lineitem(s, dir)
          .select(
            col("l_partkey"),
            col("l_quantity").cast("bigint").as("qty"),
            (dec(col("l_extendedprice")) * lit(100)).cast("bigint").as("cost_c"),
            col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .withColumn("cum_end", sum("qty").over(wOrd))
          .withColumn("total_qty", sum("qty").over(wAll))
          .withColumn("issued", expr("(3 * total_qty) div 5"))
          // interval intersection of this layer with [0, issued) on the
          // part's cumulative-quantity axis; truncating div matches //
          .withColumn("consumed",
            greatest(lit(0L), least(col("cum_end"), col("issued")) - (col("cum_end") - col("qty"))))
          .withColumn("cogs_c", expr("(cost_c * consumed) div qty"))
        val perPart = layers.groupBy("l_partkey").agg(
          max("total_qty").as("total_qty"),
          max("issued").as("issued"),
          sum("cogs_c").as("cogs_c"))
        perPart
          .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(
            count(lit(1)).as("n_parts"),
            sum("issued").as("issued_qty"),
            sum("cogs_c").as("cogs_cents"),
            sum(col("total_qty") - col("issued")).as("remaining_qty"))
          .orderBy("p_brand")
      }),

    Q(
      "k_schema_evolution",
      """Schema evolution on read (mergeSchema) — the K8 schema-snapshot
        |story exercised on REAL files: batch 1 is written with the v1
        |schema, batch 2 with v2 (an added `channel` column), both under
        |one table root; the merged read reconciles the footers and
        |null-fills the legacy rows, and the aggregate groups on the
        |evolved column with COALESCE('legacy') — the exact shape every
        |long-lived lake table hits when a producer adds a field. The
        |oracle emulates the evolution as UNION ALL with NULL, so the
        |hash proves the round-trip (write v1 + write v2 + merged read)
        |loses nothing and types reconcile identically. Bounded 3-row
        |rollup materialized before the temp table is cleaned up.""".stripMargin,
      Some(
        """WITH v1 AS (
          |  SELECT event_id, user_id,
          |         CAST(floor(value * 1000000) AS BIGINT) AS vmicro,
          |         NULL AS channel
          |  FROM events WHERE event_type = 'click'),
          |v2 AS (
          |  SELECT event_id, user_id,
          |         CAST(floor(value * 1000000) AS BIGINT) AS vmicro,
          |         CASE WHEN user_id % 2 = 0 THEN 'web' ELSE 'app' END AS channel
          |  FROM events WHERE event_type = 'purchase'),
          |u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
          |SELECT COALESCE(channel, 'legacy') AS channel,
          |       COUNT(*) AS n_rows,
          |       CAST(SUM(vmicro) AS BIGINT) AS v_sum_micro,
          |       COUNT(DISTINCT user_id) AS n_users
          |FROM u GROUP BY 1
          |ORDER BY channel""".stripMargin),
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-schevo").toFile
        try {
          val ev = Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("event_type"),
              floor(col("value") * 1000000L).cast("long").as("vmicro"))
          val root = new java.io.File(tmp, "t").getAbsolutePath
          // v1 producer: no channel column yet
          ev.filter(col("event_type") === "click")
            .select("event_id", "user_id", "vmicro")
            .write.mode("overwrite").parquet(root + "/batch=1")
          // v2 producer: schema evolved with a channel column
          ev.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("vmicro"),
              when(col("user_id") % 2 === 0, "web").otherwise("app").as("channel"))
            .write.mode("overwrite").parquet(root + "/batch=2")
          val merged = s.read.option("mergeSchema", "true").parquet(root)
          val res = merged
            .groupBy(coalesce(col("channel"), lit("legacy")).as("channel"))
            .agg(
              count(lit(1)).as("n_rows"),
              sum(col("vmicro")).as("v_sum_micro"),
              countDistinct(col("user_id")).as("n_users"))
            .orderBy("channel")
          val out = s.createDataFrame(
            new java.util.ArrayList(java.util.Arrays.asList(res.collect(): _*)),
            res.schema)
          out.orderBy("channel")
        } finally {
          org.apache.commons.io.FileUtils.deleteQuietly(tmp); ()
        }
      }))
}
