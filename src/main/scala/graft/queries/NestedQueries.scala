package graft.queries

import graft.functions.Num
import graft.ops.ActionFlattener
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Nested-document construction + generator flatten (SURVEY.md §1.1 deep
  * event documents, §2.8 generator shape) and the event-time windowed
  * aggregation capability (§2.9 — an extension; the reference only has
  * lookback polling).
  */
object NestedQueries {
  import Num.{d, dec}

  val qs: Seq[Q] = Seq(
    Q(
      "nested_flatten_actions",
      """Round-trip of the reference's deepest data shape: build nested
        |action documents (order -> ingredients[] -> batches[] + vessel
        |additions map) from the flat tables, then flatten with the
        |explode/map_entries chain — preserving the reference's inflation
        |quirk (full ingredient qty on every batch row,
        |bakery_helper.py:524-526). The oracle derives the same rows
        |directly from the flat side, so the compare proves construction
        |and flatten are exact inverses. Generators run in the scan stage;
        |the only shuffle is the collect_list build.""".stripMargin,
      Some(
        """SELECT l.l_orderkey AS action_id,
          |       l.l_partkey AS ingredient_id,
          |       concat('item', CAST(l.l_partkey AS VARCHAR)) AS ingredient_name,
          |       concat('B', CAST(l.l_linenumber AS VARCHAR), '_', CAST(t.b AS VARCHAR)) AS batch_number,
          |       concat('L', CAST(t.b AS VARCHAR)) AS lot,
          |       concat('V', CAST(l.l_suppkey % 3 AS VARCHAR)) AS vessel,
          |       l.l_quantity AS qty
          |FROM lineitem l,
          |     LATERAL (SELECT unnest(range(1, CAST(2 + l.l_linenumber % 2 AS BIGINT))) AS b) t
          |ORDER BY action_id, ingredient_id, batch_number, vessel, qty""".stripMargin),
      (s, dir) => {
        // Par.spread: the single-row-group lineitem scan ran the whole
        // nested struct+map build (the map side of the collect_list
        // shuffle) on one task — measured 1.95 s of the query's 2.9 s
        val li = graft.ops.Par.spread(Tables.lineitem(s, dir))
        // batches: 1 or 2 per line depending on parity of l_linenumber
        val batches = when(pmod(col("l_linenumber"), lit(2)) === 1,
          array(
            struct(concat(lit("B"), col("l_linenumber"), lit("_1")).as("batch_number"),
              lit("L1").as("lot")),
            struct(concat(lit("B"), col("l_linenumber"), lit("_2")).as("batch_number"),
              lit("L2").as("lot"))))
          .otherwise(array(
            struct(concat(lit("B"), col("l_linenumber"), lit("_1")).as("batch_number"),
              lit("L1").as("lot"))))
        val ingredient = struct(
          col("l_partkey").as("ingredient_id"),
          concat(lit("item"), col("l_partkey")).as("name"),
          col("l_quantity").as("qty"),
          batches.as("batches"),
          map(concat(lit("V"), pmod(col("l_suppkey"), lit(3))), col("l_quantity")).as("additions"))
        val actions = li
          .select(col("l_orderkey").as("action_id"), ingredient.as("ing"))
          .groupBy("action_id")
          .agg(collect_list(col("ing")).as("ingredients"))
        ActionFlattener.flatten(actions)
          .orderBy("action_id", "ingredient_id", "batch_number", "vessel", "qty")
      }),

    Q(
      "w_tumbling_hourly",
      """Event-time tumbling-window aggregation (the Structured-Streaming
        |windowed agg in its batch form — same window() expression the
        |streaming pipeline uses): hourly counts and exact sums per event
        |type. Map-side partial agg; shuffle sized by windows x types.""".stripMargin,
      Some(
        """SELECT date_trunc('hour', ts) AS window_start,
          |       event_type,
          |       COUNT(*) AS n,
          |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM events
          |GROUP BY 1, 2
          |ORDER BY window_start, event_type""".stripMargin),
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), d(sum(dec(col("value")))).as("sum_value"))
          .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
          .orderBy("window_start", "event_type")),

    Q(
      "w_sessionize_gap",
      """Gap-based sessionization in batch form — the twin of the streaming
        |`MicroBatchPipeline.sessionize` (flatMapGroupsWithState): events
        |within 30 minutes of the previous event merge into one session, a
        |larger gap starts a new one. The classic two-window composition:
        |lag() marks session starts, a running sum numbers them — both
        |windows share one hash partitioning on user_id, and the grouping
        |on (user_id, session_id) is satisfied by that same partitioning
        |(user_id alone co-locates every session), so the whole query is
        |ONE shuffle + the output sort at any scale. Gap compare in exact
        |integer microseconds, matching the streaming millisecond
        |arithmetic.""".stripMargin,
      Some(
        """WITH e AS (
          |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |         CAST(value AS DECIMAL(18,4)) AS v
          |  FROM events),
          |flagged AS (
          |  SELECT user_id, ts, v,
          |         CASE WHEN LAG(ts) OVER w IS NULL
          |                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
          |              THEN 1 ELSE 0 END AS new_session,
          |         event_id
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |sessions AS (
          |  SELECT user_id, ts, v,
          |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS session_id
          |  FROM flagged)
          |SELECT user_id,
          |       CAST(session_id AS BIGINT) AS session_id,
          |       MIN(ts) AS session_start,
          |       MAX(ts) AS session_end,
          |       COUNT(*) AS n_events,
          |       CAST(SUM(v) AS DOUBLE) AS total_value
          |FROM sessions
          |GROUP BY user_id, session_id
          |ORDER BY user_id, session_id""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), dec(col("value")).as("v"))
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
          .withColumn("session_id", sum(col("new_session")).over(run))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            d(sum(col("v"))).as("total_value"))
          .orderBy("user_id", "session_id")
      }),

    Q(
      "w_session_window_native",
      """Gap sessionization through Spark's NATIVE session_window operator
        |(UpdatingSessions plan) rather than the two-window composition of
        |`w_sessionize_gap` — the same one-shuffle shape, but with
        |session merging done inside the aggregate. Semantics match the
        |composed form exactly, ties included: an event EXACTLY gap
        |after its predecessor MERGES (verified empirically — Spark
        |merges sessions whose windows touch, so the oracle's new-session
        |test is strict >, identical to w_sessionize_gap).
        |session_end = last event + gap, the window's bound, where the
        |composed form reports the last event itself.""".stripMargin,
      Some(
        """WITH e AS (
          |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |         CAST(value AS DECIMAL(18,4)) AS v
          |  FROM events),
          |flagged AS (
          |  SELECT user_id, ts, v,
          |         CASE WHEN LAG(ts) OVER w IS NULL
          |                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
          |              THEN 1 ELSE 0 END AS new_session,
          |         event_id
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |sessions AS (
          |  SELECT user_id, ts, v,
          |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS session_id
          |  FROM flagged)
          |SELECT user_id,
          |       MIN(ts) AS session_start,
          |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
          |       COUNT(*) AS n_events,
          |       CAST(SUM(v) AS DOUBLE) AS total_value
          |FROM sessions
          |GROUP BY user_id, session_id
          |ORDER BY user_id, session_start""".stripMargin),
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), dec(col("value")).as("v"))
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"), d(sum(col("v"))).as("total_value"))
          .select(
            col("user_id"),
            col("sw.start").as("session_start"),
            col("sw.end").as("session_end"),
            col("n_events"), col("total_value"))
          .orderBy("user_id", "session_start")))
}
