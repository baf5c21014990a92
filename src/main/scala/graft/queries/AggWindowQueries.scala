package graft.queries

import graft.ops.Lineage._
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation / window / sort / set-op coverage
  * (SURVEY.md §2.5 A4-A8, §2.6 W2-W6, §2.7, plus K4's latest-wins dedup
  * as a batch query).
  */
object AggWindowQueries {
  import Num.{d, dec}

  /** SCD2 interval reconstruction core (see `k_scd2_intervals`): event
    * stream → per-user validity runs `(user_id, run_id, status,
    * valid_from, n_events)` — lag marks run starts, a running sum
    * numbers runs, one group-by emits; all on a single user_id hash
    * partitioning. Shared with the point-in-time lookup
    * (`j_scd2_lookup`). */
  def scd2Intervals(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runs = ev
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("new_run",
        when(lag(col("event_type"), 1).over(uw).isNull
          || lag(col("event_type"), 1).over(uw) =!= col("event_type"), 1)
          .otherwise(0))
      // first row: LAG NULL IS DISTINCT FROM type -> 1, mirrored above
      .withColumn("run_id",
        sum(col("new_run")).over(uw.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    runs.groupBy("user_id", "run_id")
      .agg(
        min(col("event_type")).as("status"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("run_id").cast("long").as("run_id"),
        col("status"), col("valid_from"), col("n_events"))
  }

  val qs: Seq[Q] = Seq(
    Q(
      "w_range_frame_sum",
      """Value-based RANGE window frames — the trailing-7-DAY (not
        |7-ROW) rolling sum: on a sparse daily frame the two frame
        |modes genuinely differ, because RANGE bounds the frame by the
        |ORDER-BY VALUE (day_id distance <= 6) and silently absent days
        |shrink the frame, while ROWS would reach 7 physical rows back
        |across the gap. The trailing7_days count rides along as the
        |frame-size evidence (< 7 exactly where the calendar is
        |sparse). Runs on the (type, day) collapsed frame — the window
        |cost is calendar-sized at any event count; exact floor-micro
        |sums.""".stripMargin,
      Some(
        """WITH d AS (
          |  SELECT event_type,
          |         epoch_us(date_trunc('day', ts)) // 86400000000 AS day_id,
          |         CAST(COUNT(*) AS BIGINT) AS n,
          |         CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |           AS v_micro
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, day_id, n, v_micro,
          |       CAST(SUM(n) OVER w AS BIGINT) AS trailing7_n,
          |       CAST(SUM(v_micro) OVER w AS BIGINT) AS trailing7_v,
          |       CAST(COUNT(*) OVER w AS BIGINT) AS trailing7_days
          |FROM d
          |WINDOW w AS (PARTITION BY event_type ORDER BY day_id
          |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
          |ORDER BY event_type, day_id""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables.events(s, dir).select(
          col("event_type"),
          expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("day_id"),
          col("value"))
          .groupBy("event_type", "day_id")
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 1000000L).cast("long")).as("v_micro"))
        val w = Window.partitionBy("event_type").orderBy("day_id")
          .rangeBetween(-6, Window.currentRow)
        d.select(col("event_type"), col("day_id"), col("n"), col("v_micro"),
          sum("n").over(w).cast("long").as("trailing7_n"),
          sum("v_micro").over(w).cast("long").as("trailing7_v"),
          count(lit(1)).over(w).cast("long").as("trailing7_days"))
          .orderBy("event_type", "day_id")
      }),

    Q(
      "w_dense_calendar_fill",
      """Calendar-spine densification — the gap-filling pass every
        |time-series consumer needs before windows mean anything: the
        |(type x day) spine is GENERATED (sequence over the stream's own
        |min/max day, crossed with the distinct type dim — both one-row/
        |tiny broadcast frames), high-value daily rollups (value >= 300,
        |exact floor-micro sums) left-join onto it, absent cells zero-
        |fill with an is_gap marker, and the per-type running total then
        |runs over the DENSE frame (on the sparse frame it would silently
        |skip missing days). Gap evidence live at every SF: 149/150
        |spine cells are gaps at sf0.001, ~55 at sf0.01, a handful at
        |sf0.1. Scale shape: the corpus collapses to (type, day) BEFORE
        |any join; the spine is bounded by calendar x type cardinality;
        |the dense frame's windows are collapsed-frame-sized.""".stripMargin,
      Some(
        """WITH ev AS (
          |  SELECT event_type,
          |         epoch_us(date_trunc('day', ts)) // 86400000000 AS day_id,
          |         value
          |  FROM events),
          |b AS (SELECT MIN(day_id) AS d0, MAX(day_id) AS d1 FROM ev),
          |ty AS (SELECT DISTINCT event_type FROM ev),
          |spine AS (
          |  SELECT ty.event_type, gs.day_id
          |  FROM ty CROSS JOIN b,
          |       LATERAL (SELECT unnest(range(b.d0, b.d1 + 1)) AS day_id) gs),
          |cnt AS (
          |  SELECT event_type, day_id, CAST(COUNT(*) AS BIGINT) AS n,
          |         CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |           AS v_micro
          |  FROM ev WHERE value >= 300 GROUP BY 1, 2),
          |f AS (
          |  SELECT s.event_type, s.day_id,
          |         COALESCE(c.n, 0) AS n, COALESCE(c.v_micro, 0) AS v_micro,
          |         CASE WHEN c.n IS NULL THEN 1 ELSE 0 END AS is_gap
          |  FROM spine s LEFT JOIN cnt c USING (event_type, day_id))
          |SELECT event_type, day_id, n, v_micro,
          |       CAST(is_gap AS BIGINT) AS is_gap,
          |       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day_id
          |                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
          |FROM f
          |ORDER BY event_type, day_id""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir).select(
          col("event_type"),
          expr("unix_micros(date_trunc('DAY', ts)) div 86400000000").as("day_id"),
          col("value"))
        val bounds = ev.agg(min("day_id").as("d0"), max("day_id").as("d1"))
        val types = ev.select("event_type").distinct()
        val spine = types.crossJoin(broadcast(bounds))
          .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day_id"))
        val cnt = ev.filter(col("value") >= 300)
          .groupBy("event_type", "day_id")
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 1000000L).cast("long")).as("v_micro"))
        val w = Window.partitionBy("event_type").orderBy("day_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(cnt, Seq("event_type", "day_id"), "left")
          .select(col("event_type"), col("day_id"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("v_micro"), lit(0L)).as("v_micro"),
            when(col("n").isNull, 1L).otherwise(0L).as("is_gap"))
          .withColumn("cum_n", sum("n").over(w).cast("long"))
          .orderBy("event_type", "day_id")
      }),

    Q(
      "w_pattern_match",
      """Row-pattern recognition (the MATCH_RECOGNIZE shape): per user,
        |detect V patterns — a strict dip-and-recovery where an event's
        |value sits below BOTH neighbors by at least 20 units — over the
        |(ts, event_id)-ordered stream, values in exact floor-micro
        |units. One lag+lead window pass marks pattern bottoms; a
        |user-keyed aggregate reports matches, the deepest dip, and the
        |deepest bottom's event (min-pack argmin: depth is maximized, so
        |the pack is (10^9-depth)-dominant with event_id tiebreak,
        |widened through DECIMAL(38,0)/HUGEINT since the pack passes
        |2^63; depth < 10^9 micro and event_id < 10^10 asserted). Scale shape: ONE user-keyed shuffle serves the
        |window and the aggregate — the same partition-window-aggregate
        |recipe a MATCH_RECOGNIZE engine compiles simple patterns to;
        |no self-joins, no per-user iteration.""".stripMargin,
      Some(
        """WITH v AS (
          |  SELECT user_id, ts, event_id,
          |         CAST(floor(value * 1000000) AS BIGINT) AS vm
          |  FROM events),
          |n AS (
          |  SELECT user_id, event_id, vm,
          |         LAG(vm) OVER w AS pv, LEAD(vm) OVER w AS nv
          |  FROM v
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |hits AS (
          |  SELECT user_id, event_id,
          |         CASE WHEN pv - vm < nv - vm THEN pv - vm ELSE nv - vm END AS depth
          |  FROM n
          |  WHERE pv IS NOT NULL AND nv IS NOT NULL
          |    AND pv - vm >= 20000000 AND nv - vm >= 20000000)
          |SELECT user_id,
          |       CAST(COUNT(*) AS BIGINT) AS n_vshapes,
          |       CAST(MAX(depth) AS BIGINT) AS max_depth_micro,
          |       CAST(MIN(CAST(1000000000 - depth AS HUGEINT) * 10000000000
          |                  + event_id)
          |              % 10000000000 AS BIGINT) AS deepest_event
          |FROM hits
          |GROUP BY 1
          |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val n = Tables.events(s, dir)
          .select(col("user_id"), col("ts"),
            // pack invariant: depth < 10^9 micro (values < 1000) and
            // event_id < 10^10 even after replica key shifts — asserted,
            // or the (-depth, event_id) pack mis-splits
            when(col("event_id") >= 0 && col("event_id") < 10000000000L, col("event_id"))
              .otherwise(raise_error(concat(
                lit("w_pattern_match pack overflow: event_id "), col("event_id"))))
              .as("event_id"),
            floor(col("value") * 1000000L).cast("long").as("vm"))
          .withColumn("pv", lag("vm", 1).over(w))
          .withColumn("nv", lead("vm", 1).over(w))
        n.filter(col("pv").isNotNull && col("nv").isNotNull &&
            col("pv") - col("vm") >= 20000000L && col("nv") - col("vm") >= 20000000L)
          .withColumn("depth",
            least(col("pv") - col("vm"), col("nv") - col("vm")))
          .withColumn("depth",
            when(col("depth") < 1000000000L, col("depth"))
              .otherwise(raise_error(concat(
                lit("w_pattern_match pack overflow: depth "), col("depth")))))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_vshapes"),
            max("depth").as("max_depth_micro"),
            expr("cast(min(cast(1000000000 - depth as decimal(38,0)) * 10000000000 "
              + "+ event_id) % 10000000000 as bigint)").as("deepest_event"))
          .orderBy("user_id")
      }),

    Q(
      "w_funnel_conversion",
      """Weekly funnel conversion — the view→purchase analysis a product
        |pipeline runs over the event stream: per (user, week), the
        |user's first view of that week and the first purchase AT OR
        |AFTER it (any time); converted = purchase within 1 day. Scale
        |shape: ONE user-key hash partitioning serves the (user, week)
        |stage aggregation, the purchase-after join, and the follow-up
        |min — the corpus shuffles once by user, then the weekly rollup
        |is week-cardinality-sized. Conversion rate in integer ppm (no
        |float ties).""".stripMargin,
      Some(
        """WITH u AS (
          |  SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
          |         MIN(ts) AS first_view
          |  FROM events WHERE event_type = 'view'
          |  GROUP BY 1, 2),
          |p AS (
          |  SELECT u.user_id, u.week, MIN(e.ts) AS first_purch
          |  FROM u JOIN events e
          |    ON e.user_id = u.user_id AND e.event_type = 'purchase'
          |       AND e.ts >= u.first_view
          |  GROUP BY 1, 2)
          |SELECT u.week AS cohort_week,
          |       COUNT(*) AS n_viewers,
          |       COUNT(CASE WHEN p.first_purch <= u.first_view + INTERVAL 1 DAY
          |                  THEN 1 END) AS n_converted,
          |       COUNT(CASE WHEN p.first_purch <= u.first_view + INTERVAL 1 DAY
          |                  THEN 1 END) * 1000000 // COUNT(*) AS conv_ppm
          |FROM u LEFT JOIN p ON u.user_id = p.user_id AND u.week = p.week
          |GROUP BY u.week
          |ORDER BY cohort_week""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val u = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), date_trunc("week", col("ts")).as("week"))
          .agg(min(col("ts")).as("first_view"))
        val p = u.select(col("user_id"), col("week"), col("first_view"))
          .join(ev.filter(col("event_type") === "purchase")
            .select(col("user_id").as("p_user"), col("ts")),
            col("user_id") === col("p_user") && col("ts") >= col("first_view"))
          .groupBy(col("user_id"), col("week"))
          .agg(min(col("ts")).as("first_purch"))
        u.join(p, Seq("user_id", "week"), "left")
          .groupBy(col("week").as("cohort_week"))
          .agg(
            count(lit(1)).as("n_viewers"),
            count(when(col("first_purch") <= col("first_view") + expr("INTERVAL 1 DAY"),
              1)).as("n_converted"))
          .select(col("cohort_week"), col("n_viewers"), col("n_converted"),
            expr("n_converted * 1000000 div n_viewers").as("conv_ppm"))
          .orderBy("cohort_week")
      }),

    Q(
      "k_scd2_intervals",
      """Slowly-changing-dimension (type 2) reconstruction from a change
        |log — the warehouse operation that turns an event stream into
        |validity intervals: per user, consecutive runs of the same event
        |type collapse into one row with valid_from = first ts of the run
        |and valid_to = the next run's start (NULL while current). The
        |run-length composition is the sessionize pattern: lag() marks
        |run starts, a running sum numbers runs, one group-by emits the
        |interval — ALL of it on a single user_id hash partitioning, so
        |the corpus shuffles once at any scale (plus the output sort).""".stripMargin,
      Some(
        """WITH e AS (
          |  SELECT user_id, event_type, ts, event_id FROM events),
          |flagged AS (
          |  SELECT user_id, event_type, ts,
          |         CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
          |              THEN 1 ELSE 0 END AS new_run,
          |         event_id
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |runs AS (
          |  SELECT user_id, event_type, ts,
          |         SUM(new_run) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS run_id
          |  FROM flagged),
          |iv AS (
          |  SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
          |         MIN(event_type) AS status,
          |         MIN(ts) AS valid_from,
          |         COUNT(*) AS n_events
          |  FROM runs GROUP BY user_id, run_id)
          |SELECT user_id, run_id, status, valid_from,
          |       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
          |         AS valid_to,
          |       n_events
          |FROM iv
          |ORDER BY user_id, run_id""".stripMargin),
      (s, dir) => {
        val iv = scd2Intervals(Tables.events(s, dir))
        val rw = Window.partitionBy("user_id").orderBy("run_id")
        iv.select(col("user_id"), col("run_id"),
            col("status"), col("valid_from"),
            lead(col("valid_from"), 1).over(rw).as("valid_to"),
            col("n_events"))
          .orderBy("user_id", "run_id")
      }),

    Q(
      "a_gap_interpolate",
      """Time-series gap repair by linear interpolation — the cleaning
        |step a sensor/metrics pipeline applies before aggregation: every
        |7th reading (event_id % 7 = 0) plays a missing value, and each
        |gap fills linearly between its surviving event-time neighbors in
        |EXACT integer arithmetic: v = prev + floor((next-prev) *
        |(ts-prev_ts) / (next_ts-prev_ts)) with values in FLOOR
        |value-micros (floor: no rounding tie) and times in epoch
        |MILLISECONDS (milli, not micro, keeps the cross product inside
        |int64) — bigint throughout, so both engines land the identical
        |filled series. The slope can be negative; both engines truncate
        |integer division toward zero (Spark `div`, DuckDB `//` — checked
        |on -7/2 = -3 both sides), so the plain quotient is already
        |engine-identical. Edge gaps (no neighbor on one side) carry the
        |surviving neighbor. One user_id hash partitioning serves both
        |neighbor windows.""".stripMargin,
      Some(
        """WITH e AS (
          |  SELECT user_id, event_id, epoch_us(ts) // 1000 AS ts_ms,
          |         CAST(floor(value * 1000000) AS BIGINT) AS v_us,
          |         (event_id % 7 = 0) AS missing
          |  FROM events),
          |nb AS (
          |  SELECT user_id, event_id, ts_ms, v_us, missing,
          |         LAG(CASE WHEN NOT missing THEN v_us END IGNORE NULLS) OVER w AS pv,
          |         LAG(CASE WHEN NOT missing THEN ts_ms END IGNORE NULLS) OVER w AS pt,
          |         LEAD(CASE WHEN NOT missing THEN v_us END IGNORE NULLS) OVER w AS nv,
          |         LEAD(CASE WHEN NOT missing THEN ts_ms END IGNORE NULLS) OVER w AS nt
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
          |SELECT user_id, event_id, ts_ms, missing,
          |       CASE
          |         WHEN NOT missing THEN v_us
          |         WHEN pv IS NOT NULL AND nv IS NOT NULL
          |           THEN pv + (nv - pv) * (ts_ms - pt) // (nt - pt)
          |         WHEN pv IS NOT NULL THEN pv
          |         WHEN nv IS NOT NULL THEN nv
          |         ELSE 0 END AS filled_us
          |FROM nb
          |ORDER BY user_id, ts_ms, event_id""".stripMargin),
      (s, dir) => {
        val uw = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts) div 1000").as("ts_ms"),
            floor(col("value") * 1000000).cast("long").as("v_us"),
            (pmod(col("event_id"), lit(7)) === 0).as("missing"))
        e.withColumn("pv",
            lag(when(!col("missing"), col("v_us")), 1, null, ignoreNulls = true).over(uw))
          .withColumn("pt",
            lag(when(!col("missing"), col("ts_ms")), 1, null, ignoreNulls = true).over(uw))
          .withColumn("nv",
            lead(when(!col("missing"), col("v_us")), 1, null, ignoreNulls = true).over(uw))
          .withColumn("nt",
            lead(when(!col("missing"), col("ts_ms")), 1, null, ignoreNulls = true).over(uw))
          .select(col("user_id"), col("event_id"), col("ts_ms"), col("missing"),
            when(!col("missing"), col("v_us"))
              .when(col("pv").isNotNull && col("nv").isNotNull,
                expr("pv + (nv - pv) * (ts_ms - pt) div (nt - pt)"))
              .when(col("pv").isNotNull, col("pv"))
              .when(col("nv").isNotNull, col("nv"))
              .otherwise(lit(0L)).as("filled_us"))
          .orderBy("user_id", "ts_ms", "event_id")
      }),

    Q(
      "a4_a6_dispatch_summary",
      """A4 + A6: dispatch summary / UI stat-tile conditional counts
        |(bakery_ops_helper.py:222-227, LiveDataComparison.js:436-453), per
        |event type: total, conditional successes, distinct users, exact
        |value sum. Distinct-count is a capability extension (reference has
        |none). Single hash aggregate, map-side partials.""".stripMargin,
      Some(
        """SELECT event_type,
          |       COUNT(*) AS total,
          |       COUNT(*) FILTER (WHERE value > 50) AS n_high,
          |       COUNT(DISTINCT user_id) AS n_users,
          |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin),
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("total"),
            count(when(col("value") > 50, 1)).as("n_high"),
            countDistinct(col("user_id")).as("n_users"),
            d(sum(dec(col("value")))).as("sum_value"))
          .orderBy("event_type")),

    Q(
      "a5_onhand_clamped",
      """A5/K7: inventory on-hand mutation with the reference's PER-EVENT
        |clamp (main.py:1775-1777): each USAGE decrements, everything else
        |increments, and the balance clamps at zero after EVERY adjustment,
        |not once on the net sum — so "use 100 on empty stock, then receive
        |50" ends at 50, matching the streaming twin
        |`StatefulOnHand.runningOnHand`. The sequential fold
        |`s_i = max(0, s_{i-1} + x_i)` is computed distributively via the
        |identity `s_n = total - min(0, min_k prefix_k)` over the running
        |prefix sums in (ts, event_id) order — one partitioned window (no
        |global sort) + one hash aggregate. 'purchase' plays USAGE.""".stripMargin,
      Some(
        """WITH sgn AS (
          |  SELECT user_id, ts, event_id,
          |         CASE WHEN event_type = 'purchase'
          |              THEN -CAST(value AS DECIMAL(18,4))
          |              ELSE CAST(value AS DECIMAL(18,4)) END AS signed
          |  FROM events),
          |run AS (
          |  SELECT user_id, signed,
          |         SUM(signed) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
          |  FROM sgn)
          |SELECT user_id AS product_key,
          |       -- no LEAST: DuckDB 1.0 LEAST(decimal, decimal) returns DOUBLE,
          |       -- losing exactness; CASE keeps the arithmetic in decimal.
          |       CAST(CASE WHEN MIN(running) < 0
          |                 THEN CAST(SUM(signed) AS DECIMAL(28,4))
          |                      - CAST(MIN(running) AS DECIMAL(28,4))
          |                 ELSE CAST(SUM(signed) AS DECIMAL(28,4)) END
          |            AS DOUBLE) AS on_hand,
          |       COUNT(*) AS n_adjustments
          |FROM run
          |GROUP BY user_id
          |ORDER BY product_key""".stripMargin),
      (s, dir) => {
        val signed = when(col("event_type") === "purchase", -dec(col("value")))
          .otherwise(dec(col("value")))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), signed.as("signed"))
          .withColumn("running", sum(col("signed")).over(w))
          .groupBy(col("user_id").as("product_key"))
          .agg(
            d(sum(col("signed")) -
              least(lit(0).cast(Num.Money), min(col("running")))).as("on_hand"),
            count(lit(1)).as("n_adjustments"))
          .orderBy("product_key")
      }),

    Q(
      "a3_dynamic_pivot",
      """A3 as a true columnar pivot: per-user event counts and exact value
        |sums spread across event-type columns (groupBy().pivot() with the
        |value domain pinned so Catalyst skips the discovery pass — at
        |scale, always pin the pivot domain: the alternative is an extra
        |collect over the distinct values).""".stripMargin,
      Some(
        """SELECT user_id,
          |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
          |       COUNT(*) FILTER (WHERE event_type = 'view') AS view_n,
          |       COUNT(*) FILTER (WHERE event_type = 'error') AS error_n,
          |       CAST(SUM(CASE WHEN event_type = 'purchase'
          |                     THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase_value
          |FROM events
          |GROUP BY user_id
          |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val pivoted = Tables.events(s, dir)
          .groupBy("user_id")
          .pivot("event_type", Seq("purchase", "view", "error"))
          .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("val"))
        pivoted.select(
          col("user_id"),
          coalesce(col("purchase_n"), lit(0L)).as("purchase_n"),
          coalesce(col("view_n"), lit(0L)).as("view_n"),
          coalesce(col("error_n"), lit(0L)).as("error_n"),
          d(col("purchase_val")).as("purchase_value"))
          .orderBy("user_id")
      }),

    Q(
      "a7_schema_maxlen",
      """A7: schema-inference max-string-length scan
        |(schema_manager.py:208) per group: the VARCHAR(n) sizing pass.""".stripMargin,
      Some(
        """SELECT lang,
          |       COUNT(*) AS n_docs,
          |       MAX(length(text)) AS max_text_len,
          |       MAX(length(source)) AS max_source_len
          |FROM documents
          |GROUP BY lang
          |ORDER BY lang""".stripMargin),
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            max(length(col("text"))).as("max_text_len"),
            max(length(col("source"))).as("max_source_len"))
          .orderBy("lang")),

    Q(
      "a8_next_version",
      """A8: next-version counter (schema_manager.py:69-75):
        |COALESCE(MAX(version),0)+1 per registry key.""".stripMargin,
      Some(
        """SELECT source, COALESCE(MAX(doc_id), 0) + 1 AS next_version
          |FROM documents
          |GROUP BY source
          |ORDER BY source""".stripMargin),
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy("source")
          .agg((coalesce(max(col("doc_id")), lit(0)) + 1).as("next_version"))
          .orderBy("source")),

    Q(
      "w2_w4_pagination",
      """W2 + W4: sort-by-name + offset/size pagination
        |(main.py:1691-1696). Page: offset 10, size 20 over the distinct
        |sorted name domain. Implemented as ORDER BY + OFFSET + LIMIT, which
        |Spark plans as a per-partition top-(offset+size) with a driver-side
        |merge — no global sort and NO window at all, so the page cost is
        |O(offset+size) per partition regardless of table size. Deep
        |pagination (offset >> size) should switch to keyset continuation
        |(WHERE p_name > last_seen) at the API layer; same plan shape.""".stripMargin,
      Some(
        """SELECT DISTINCT p_name FROM part
          |ORDER BY p_name
          |LIMIT 20 OFFSET 10""".stripMargin),
      (s, dir) =>
        Tables.part(s, dir).select("p_name").distinct()
          .orderBy("p_name").offset(10).limit(20)),

    Q(
      "w_sliding_hour",
      """Sliding event-time window (RANGE frame): per user, the running
        |1-hour trailing sum/count/average at every purchase event — the
        |moving-aggregate shape (rate limiting, trailing spend, rolling
        |QC stats). RANGE BETWEEN on integer epoch seconds, not ROWS: the
        |frame is defined by TIME, so ties in the timestamp enter the
        |frame together and the result is order-independent. One hash
        |partition on user_id, linear frame scan — no global sort.""".stripMargin,
      Some(
        """WITH e AS (
          |  SELECT user_id, event_id,
          |         CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS BIGINT) AS sec,
          |         CAST(value AS DECIMAL(18,4)) AS v
          |  FROM events WHERE event_type = 'purchase')
          |SELECT user_id, event_id, sec,
          |       CAST(SUM(v) OVER w AS DOUBLE) AS hour_sum,
          |       COUNT(*) OVER w AS n_hour,
          |       CAST(SUM(v) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS hour_avg
          |FROM e
          |WINDOW w AS (PARTITION BY user_id ORDER BY sec
          |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
          |ORDER BY user_id, sec, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("sec")
          .rangeBetween(-3600, Window.currentRow)
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            // `div`, not `/`: Spark's / is DOUBLE division, and a quotient
            // whose fraction rounds up to 1.0 in double would truncate to
            // the NEXT second, diverging from the oracle's integer //
            expr("unix_micros(ts) div 1000000").as("sec"),
            dec(col("value")).as("v"))
          .select(col("user_id"), col("event_id"), col("sec"),
            d(sum(col("v")).over(w)).as("hour_sum"),
            count(lit(1)).over(w).as("n_hour"),
            (d(sum(col("v")).over(w)) / count(lit(1)).over(w)).as("hour_avg"))
          .orderBy("user_id", "sec", "event_id")
      }),

    Q(
      "a_rollup_totals",
      """Multi-level totals via ROLLUP (the report-page subtotal shape):
        |(source, lang) detail, per-source subtotal, grand total in ONE
        |aggregate pass — Spark expands grouping sets inside a single
        |hash aggregate rather than unioning three scans. The grouping
        |level is emitted explicitly (grouping() bits) and NULL group
        |keys are COALESCE'd to a sentinel so both engines order
        |identically.""".stripMargin,
      Some(
        """SELECT (2 * GROUPING(source) + GROUPING(lang)) AS lvl,
          |       COALESCE(source, '<all>') AS source_k,
          |       COALESCE(lang, '<all>') AS lang_k,
          |       COUNT(*) AS n_docs,
          |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
          |FROM documents
          |GROUP BY ROLLUP(source, lang)
          |ORDER BY lvl, source_k, lang_k""".stripMargin),
      (s, dir) =>
        Tables.documents(s, dir)
          .rollup("source", "lang")
          .agg(
            // grouping() must be computed IN the aggregate (it reads the
            // grouping-set id, which doesn't exist after the agg)
            (grouping(col("source")) * 2 + grouping(col("lang"))).cast("int").as("lvl"),
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"))
          .select(
            col("lvl"),
            coalesce(col("source"), lit("<all>")).as("source_k"),
            coalesce(col("lang"), lit("<all>")).as("lang_k"),
            col("n_docs"), col("total_chars"))
          .orderBy("lvl", "source_k", "lang_k")),

    Q(
      "a_grouping_sets",
      """Explicit GROUPING SETS — the asymmetric subtotal combination
        |ROLLUP cannot express: (source, lang) detail, per-LANG subtotal
        |(crossing the rollup hierarchy), and grand total, still one
        |aggregate pass over one scan. Same sentinel/level discipline as
        |a_rollup_totals so both engines order identically.""".stripMargin,
      Some(
        """SELECT (2 * GROUPING(source) + GROUPING(lang)) AS lvl,
          |       COALESCE(source, '<all>') AS source_k,
          |       COALESCE(lang, '<all>') AS lang_k,
          |       COUNT(*) AS n_docs,
          |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
          |FROM documents
          |GROUP BY GROUPING SETS ((source, lang), (lang), ())
          |ORDER BY lvl, source_k, lang_k""".stripMargin),
      (s, dir) =>
        Tables.documents(s, dir)
          .groupingSets(
            Seq(Seq(col("source"), col("lang")), Seq(col("lang")), Seq.empty),
            col("source"), col("lang"))
          .agg(
            (grouping(col("source")) * 2 + grouping(col("lang"))).cast("int").as("lvl"),
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"))
          .select(
            col("lvl"),
            coalesce(col("source"), lit("<all>")).as("source_k"),
            coalesce(col("lang"), lit("<all>")).as("lang_k"),
            col("n_docs"), col("total_chars"))
          .orderBy("lvl", "source_k", "lang_k")),

    Q(
      "a_profile_columns",
      """One-pass table profiling (the data-quality survey a lake runs on
        |every new feed): per-column null counts, distinct counts, and
        |numeric min/max/sum, all in a single hash aggregate over one scan
        |— the generalization of the reference's max-string-length schema
        |probe (A7). Exact distincts here; at 100 TB the same query swaps
        |in approx_count_distinct (HLL) per column.""".stripMargin,
      Some(
        """SELECT COUNT(*) AS n_rows,
          |       COUNT(*) - COUNT(text) AS text_nulls,
          |       COUNT(DISTINCT lang) AS lang_distinct,
          |       COUNT(DISTINCT source) AS source_distinct,
          |       MIN(n_chars) AS chars_min,
          |       MAX(n_chars) AS chars_max,
          |       CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
          |       MAX(length(text)) AS text_maxlen
          |FROM documents""".stripMargin),
      (s, dir) =>
        Tables.documents(s, dir)
          .agg(
            count(lit(1)).as("n_rows"),
            (count(lit(1)) - count(col("text"))).as("text_nulls"),
            countDistinct(col("lang")).as("lang_distinct"),
            countDistinct(col("source")).as("source_distinct"),
            min(col("n_chars")).as("chars_min"),
            max(col("n_chars")).as("chars_max"),
            sum(col("n_chars")).as("chars_sum"),
            max(length(col("text"))).as("text_maxlen"))),

    Q(
      "a_percentiles_exact",
      """Exact percentiles per source (p50/p90 of document length): both
        |engines define continuous quantiles as the same linear
        |interpolation over the sorted values, so the compare is exact.
        |Spark's percentile is a sort-based aggregate with partial
        |combine; at 100 TB the same report moves to approx_percentile
        |(t-digest) with a pinned error bound — the exact form stays as
        |the audit path.""".stripMargin,
      Some(
        """SELECT source,
          |       quantile_cont(n_chars, 0.5) AS p50,
          |       quantile_cont(n_chars, 0.9) AS p90
          |FROM documents
          |GROUP BY source
          |ORDER BY source""".stripMargin),
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy("source")
          .agg(
            expr("percentile(n_chars, 0.5)").as("p50"),
            expr("percentile(n_chars, 0.9)").as("p90"))
          .orderBy("source")),

    Q(
      "a_outlier_mad",
      """Robust outlier detection per group — median absolute deviation,
        |the data-quality gate that survives the skewed value
        |distributions a mean/stddev z-score drowns in: per event type,
        |the exact median, the MAD, and how many events sit beyond the
        |standard 3σ-equivalent fence (4.4478 = 3 × 1.4826 as ONE
        |constant, so both engines multiply identically). Three passes in
        |the percentile-audit discipline of a_percentiles_exact: median
        |agg (key-sized, broadcast back), deviation scan, MAD agg
        |(broadcast back), fence count — every join build side is
        |group-cardinality-sized, the events table only streams. No
        |rounding anywhere: both engines interpolate quantiles with the
        |same formula over the same doubles, so the compare is exact.""".stripMargin,
      Some(
        """WITH med AS (
          |  SELECT event_type, quantile_cont(value, 0.5) AS med
          |  FROM events GROUP BY event_type),
          |dev AS (
          |  SELECT e.event_type, abs(e.value - m.med) AS adev
          |  FROM events e JOIN med m USING (event_type)),
          |mad AS (
          |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
          |  FROM dev GROUP BY event_type)
          |SELECT d.event_type,
          |       MAX(me.med) AS med,
          |       MAX(m.mad) AS mad,
          |       CAST(SUM(CASE WHEN d.adev > 4.4478 * m.mad THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_outliers,
          |       COUNT(*) AS n_total
          |FROM dev d JOIN mad m USING (event_type) JOIN med me USING (event_type)
          |GROUP BY d.event_type
          |ORDER BY d.event_type""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir).select("event_type", "value")
        val med = ev.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(
            max(col("med")).as("med"),
            max(col("mad")).as("mad"),
            sum(when(col("adev") > lit(4.4478) * col("mad"), 1).otherwise(0))
              .cast("long").as("n_outliers"),
            count(lit(1)).as("n_total"))
          .orderBy("event_type")
      }),

    Q(
      "w_rank_suite",
      """The ranking-function family in one partitioned window pass: rank
        |(gaps on ties), dense_rank, percent_rank, ntile(4), and lead —
        |all sharing a single (brand, qty desc, key) window, so one
        |shuffle serves five functions. Restricted to one returnflag to
        |keep the verify output bounded; ties are real (integer
        |quantities) and resolved by the unique key in the order
        |BEFORE ranking, so rank gaps are engine-stable.""".stripMargin,
      Some(
        """WITH t AS (
          |  SELECT p.p_brand, l.l_orderkey, l.l_linenumber,
          |         CAST(l.l_quantity AS INT) AS qty
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          |  WHERE l.l_returnflag = 'R' AND l.l_linenumber = 1)
          |SELECT p_brand, l_orderkey, qty,
          |       RANK() OVER w AS rnk,
          |       DENSE_RANK() OVER w AS drnk,
          |       PERCENT_RANK() OVER w AS prnk,
          |       NTILE(4) OVER w AS quartile,
          |       LEAD(qty) OVER w AS next_qty
          |FROM t
          |WINDOW w AS (PARTITION BY p_brand ORDER BY qty DESC, l_orderkey)
          |ORDER BY p_brand, rnk, l_orderkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("p_brand").orderBy(col("qty").desc, col("l_orderkey"))
        Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R" && col("l_linenumber") === 1)
          .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"), col("l_orderkey"),
            col("l_quantity").cast("int").as("qty"))
          .select(col("p_brand"), col("l_orderkey"), col("qty"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            percent_rank().over(w).as("prnk"),
            ntile(4).over(w).as("quartile"),
            lead(col("qty"), 1).over(w).as("next_qty"))
          .orderBy("p_brand", "rnk", "l_orderkey")
      }),

    Q(
      "w_topk_per_window",
      """Top-k per TIME window — the leaderboard/trending shape (hourly
        |top-3 users by spend): time-bucketed pre-aggregation first (the
        |shuffle carries (hour, user) group cardinality, not events), then
        |a rank window partitioned by hour with the row_number<=3 filter
        |that Spark rewrites to WindowGroupLimit — each partition pre-trims
        |to 3 rows per hour BEFORE the window exchange, so the rank shuffle
        |is k-per-window-sized at any event volume. Ranking orders by the
        |decimal-exact total (ties by user id), deterministic on both
        |engines.""".stripMargin,
      Some(
        """WITH hourly AS (
          |  SELECT date_trunc('hour', ts) AS hour_start, user_id,
          |         COUNT(*) AS n,
          |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
          |  FROM events GROUP BY 1, 2)
          |SELECT hour_start, user_id, n, total_value, rnk FROM (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_start
          |                               ORDER BY total_value DESC, user_id) AS rnk
          |  FROM hourly)
          |WHERE rnk <= 3
          |ORDER BY hour_start, rnk""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("hour_start")
          .orderBy(col("total_value").desc, col("user_id"))
        Tables.events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("user_id"))
          .agg(count(lit(1)).as("n"), d(sum(dec(col("value")))).as("total_value"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select("hour_start", "user_id", "n", "total_value", "rnk")
          .orderBy("hour_start", "rnk")
      }),

    Q(
      "w_keyset_page",
      """W4's scale path: KEYSET pagination (continue after the last seen
        |key) instead of OFFSET. The predicate pushes to the parquet scan
        |(PushedFilters), so page N costs the same as page 1 — OFFSET
        |pagination degrades linearly with depth because every page
        |re-ranks the prefix. Same 20-row page contract as
        |w2_w4_pagination, anchored at the key its first page ends on.""".stripMargin,
      Some(
        """SELECT DISTINCT p_name FROM part
          |WHERE p_name > 'aquamarine'
          |ORDER BY p_name
          |LIMIT 20""".stripMargin),
      (s, dir) =>
        Tables.part(s, dir)
          .filter(col("p_name") > "aquamarine")
          .select("p_name").distinct()
          .orderBy("p_name").limit(20)),

    Q(
      "w5_topk_latest",
      """W5/W6: latest-N inspection (dag_bakery_ops_to_jde.py:24-30,
        |s3_helper.py:218): ORDER BY ts DESC LIMIT 10. Spark plans this as
        |TakeOrderedAndProject — a per-partition top-k + driver merge, no
        |global sort, which is exactly what survives at 100 TB.""".stripMargin,
      Some(
        """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
          |FROM events
          |ORDER BY ts DESC, event_id DESC
          |LIMIT 10""".stripMargin),
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
          .orderBy(col("ts").desc, col("event_id").desc)
          .limit(10)),

    Q(
      "set_ops_membership",
      """§2.7 set operations (capability the reference only approximates
        |with python set membership): INTERSECT / EXCEPT both directions over
        |two key domains, tagged and unioned. big = customers with any
        |order > 400k; neg = customers with negative balance.""".stripMargin,
      Some(
        """WITH big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 400000),
          |neg AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal < 0)
          |SELECT 'both' AS tag, k FROM (SELECT k FROM big INTERSECT SELECT k FROM neg)
          |UNION ALL
          |SELECT 'big_only' AS tag, k FROM (SELECT k FROM big EXCEPT SELECT k FROM neg)
          |UNION ALL
          |SELECT 'neg_only' AS tag, k FROM (SELECT k FROM neg EXCEPT SELECT k FROM big)
          |ORDER BY tag, k""".stripMargin),
      (s, dir) => {
        val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("k")).distinct()
        val neg = Tables.customer(s, dir).filter(col("c_acctbal") < 0)
          .select(col("c_custkey").as("k")).distinct()
        val both = big.intersect(neg).select(lit("both").as("tag"), col("k"))
        val bigOnly = big.except(neg).select(lit("big_only").as("tag"), col("k"))
        val negOnly = neg.except(big).select(lit("neg_only").as("tag"), col("k"))
        both.unionAll(bigOnly).unionAll(negOnly).orderBy("tag", "k")
      }),

    Q(
      "k4_latest_wins_state",
      """K4's merge semantic as a batch query: latest record per key wins
        |(INSERT … ON CONFLICT DO UPDATE, jde_helper.py:1006-1023). Explicit
        |version order (ts desc, event_id desc), row_number()=1. The
        |stateful sink twin lives in graft.state.DispatchState.""".stripMargin,
      Some(
        """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
          |       value AS last_value
          |FROM (SELECT user_id, event_id, event_type, value,
          |             ROW_NUMBER() OVER (PARTITION BY user_id
          |                                ORDER BY ts DESC, event_id DESC) AS rn
          |      FROM events)
          |WHERE rn = 1
          |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_type"), col("value").as("last_value"))
          .orderBy("user_id")
      }),

    Q(
      "w_rolling_distinct",
      """Rolling 7-day DISTINCT user count per day — the DAU/WAU shape,
        |and the one rolling aggregate a RANGE-frame window CANNOT
        |express (COUNT(DISTINCT) is not frame-composable: a user active
        |on 3 days in the window must count once). Shape that scales: the
        |event stream first collapses to distinct (day, user) pairs with
        |per-pair event counts (map-side combinable — the only
        |event-sized shuffle), then each pair fans out row-locally to the
        |<=7 trailing windows it feeds (fan-out is over the COLLAPSED
        |frame, days x users, not events), and a (window-day, user)
        |count-distinct plus event sum finishes on window-day
        |cardinality. Windows whose anchor day falls after the last
        |observed day are emitted too (their trailing range still
        |intersects the data) — both engines generate the identical
        |window set from the data itself.""".stripMargin,
      Some(
        """WITH du AS (
          |  SELECT date_trunc('day', ts) AS day, user_id, COUNT(*) AS n
          |  FROM events GROUP BY 1, 2),
          |f AS (
          |  SELECT du.day + i * INTERVAL 1 DAY AS wday, du.user_id, du.n
          |  FROM du CROSS JOIN range(7) t(i))
          |SELECT wday,
          |       COUNT(DISTINCT user_id) AS u7,
          |       CAST(SUM(n) AS BIGINT) AS e7
          |FROM f GROUP BY wday ORDER BY wday""".stripMargin),
      (s, dir) => {
        val du = Tables.events(s, dir)
          .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        du.select(col("day"), col("user_id"), col("n"),
            explode(sequence(lit(0), lit(6))).as("i"))
          .select((col("day") + expr("make_interval(0,0,0,i)")).as("wday"),
            col("user_id"), col("n"))
          .groupBy("wday")
          .agg(countDistinct(col("user_id")).as("u7"), sum(col("n")).as("e7"))
          .orderBy("wday")
      }),

    Q(
      "a_ewma_smooth",
      """Exponentially-weighted moving average per user (alpha = 0.2) over
        |the purchase stream — the sequential-recurrence aggregate
        |(anomaly baselines, smoothed spend) that NO window frame can
        |express: s_t = (2*v_t + 8*s_{t-1}) / 10 depends on every prior
        |step. Batch form of the mapGroupsWithState running-state
        |pattern, relationally: one user-key aggregate collects the
        |(ts, event_id)-sorted value sequence, then a row-local fold runs
        |the recurrence in integer micro-units with floor division at
        |every step — identical bigint trajectories on both engines
        |(doubles would accumulate engine-specific rounding). Shuffle
        |carries per-user sequences (bounded by the retention window at
        |scale — the same bound any stateful-stream twin needs); the fold
        |is scan-side compute. Output: final EWMA, last raw value, and
        |count per user.""".stripMargin,
      Some(
        """WITH p AS (
          |  SELECT user_id, ts, event_id,
          |         CAST(floor(value * 1000000) AS BIGINT) AS vm
          |  FROM events WHERE event_type = 'purchase'),
          |s AS (
          |  SELECT user_id,
          |         CAST(COUNT(*) AS BIGINT) AS n,
          |         list_reduce(list(vm ORDER BY ts, event_id),
          |           (a, b) -> (200000 * b + 800000 * a) // 1000000) AS ewma_micro,
          |         (max({'ts': ts, 'eid': event_id, 'v': vm})).v AS last_micro
          |  FROM p GROUP BY user_id)
          |SELECT user_id, n, ewma_micro, last_micro
          |FROM s ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val p = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 1000000L).cast("long").as("vm"))
        // sort_array gives the deterministic (ts, event_id) replay order;
        // the fold seeds from the first element (null-acc branch), exactly
        // DuckDB's list_reduce seeding
        p.groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sort_array(collect_list(
              struct(col("ts"), col("event_id"), col("vm")))).as("seq"))
          .select(col("user_id"), col("n"),
            expr("""aggregate(seq, CAST(NULL AS BIGINT),
                   |  (a, x) -> if(a IS NULL, x.vm,
                   |             (200000 * x.vm + 800000 * a) div 1000000))"""
              .stripMargin).as("ewma_micro"),
            expr("element_at(seq, -1).vm").as("last_micro"))
          .orderBy("user_id")
      }),

    Q(
      "w_cohort_retention",
      """Weekly cohort retention triangle — the product-analytics staple:
        |users cohort by the week of their first qualifying activity
        |(high-value signups, so the activity signal is sparse enough to
        |decay); retention at week k = active users k weeks after their
        |cohort week, as a ppm share of the cohort. Week arithmetic is
        |epoch-seconds floor division on Monday-aligned truncs (both
        |engines truncate weeks to Monday). Scale shape: activity first
        |collapses to distinct (user, week) — the only event-sized
        |shuffle; the cohort week is a min window over the SAME user
        |partitioning (no join back); the (cohort, k) count-distinct runs
        |on the collapsed frame; cohort sizes are the k=0 rows, joined
        |back by broadcast (cohort-cardinality-sized).""".stripMargin,
      Some(
        """WITH du AS (
          |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
          |  FROM events WHERE event_type = 'signup' AND value > 90),
          |c AS (SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cwk FROM du),
          |r AS (
          |  SELECT cwk,
          |         (CAST(epoch(wk) AS BIGINT) - CAST(epoch(cwk) AS BIGINT)) // 604800 AS k,
          |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
          |  FROM c GROUP BY 1, 2),
          |sz AS (SELECT cwk, n_active AS cohort_n FROM r WHERE k = 0)
          |SELECT r.cwk AS cohort_week, r.k AS week_k, r.n_active, sz.cohort_n,
          |       r.n_active * 1000000 // sz.cohort_n AS ret_ppm
          |FROM r JOIN sz ON r.cwk = sz.cwk
          |ORDER BY cohort_week, week_k""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val du = Tables.events(s, dir)
          .filter(col("event_type") === "signup" && col("value") > 90)
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        val c = du.withColumn("cwk",
          min(col("wk")).over(Window.partitionBy("user_id")))
        val r = c.groupBy(col("cwk"),
            ((unix_timestamp(col("wk")) - unix_timestamp(col("cwk"))) / 604800L)
              .cast("long").as("k"))
          .agg(countDistinct(col("user_id")).as("n_active"))
        val sz = r.filter(col("k") === 0)
          .select(col("cwk").as("c2"), col("n_active").as("cohort_n"))
        r.join(broadcast(sz), col("cwk") === col("c2"))
          .select(col("cwk").as("cohort_week"), col("k").as("week_k"),
            col("n_active"), col("cohort_n"),
            expr("n_active * 1000000 div cohort_n").as("ret_ppm"))
          .orderBy("cohort_week", "week_k")
      }),

    Q(
      "w_rfm_segments",
      """RFM segmentation — the classic customer-value cube (Recency /
        |Frequency / Monetary), median-split into 8 segments: per user,
        |days since last purchase (against the corpus max-timestamp
        |anchor), purchase count, and monetary total in exact floor-micro
        |units; each dimension splits at its own weighted median
        |(collapsed-frame cumulative window — the a_weighted_median
        |discipline, so the median scan runs over |distinct values| rows,
        |never |users|), and a user's segment is the three >=/<= median
        |bits. Output: the 8 segment rows with user counts, total
        |frequency, total monetary, and the three medians carried as
        |calibration evidence. Scale shape: ONE user-keyed aggregate over
        |events; three value-collapsed median frames; medians broadcast
        |back as one-row frames; the segment rollup is an 8-group
        |aggregate.""".stripMargin,
      Some(
        """WITH u AS (
          |  SELECT user_id,
          |         CAST(COUNT(*) AS BIGINT) AS freq,
          |         CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |           AS mon_micro,
          |         CAST(MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS last_s
          |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
          |a AS (SELECT CAST(MAX(last_s) AS BIGINT) AS anchor_s FROM u),
          |r AS (
          |  SELECT user_id, (a.anchor_s - last_s) // 86400 AS rec_days,
          |         freq, mon_micro
          |  FROM u, a),
          |mr AS (
          |  SELECT MIN(v) AS r_med FROM (
          |    SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum,
          |           CAST(SUM(c) OVER () AS BIGINT) AS n
          |    FROM (SELECT rec_days AS v, CAST(COUNT(*) AS BIGINT) AS c
          |          FROM r GROUP BY 1))
          |  WHERE 2 * cum >= n),
          |mf AS (
          |  SELECT MIN(v) AS f_med FROM (
          |    SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum,
          |           CAST(SUM(c) OVER () AS BIGINT) AS n
          |    FROM (SELECT freq AS v, CAST(COUNT(*) AS BIGINT) AS c
          |          FROM r GROUP BY 1))
          |  WHERE 2 * cum >= n),
          |mm AS (
          |  SELECT MIN(v) AS m_med FROM (
          |    SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum,
          |           CAST(SUM(c) OVER () AS BIGINT) AS n
          |    FROM (SELECT mon_micro AS v, CAST(COUNT(*) AS BIGINT) AS c
          |          FROM r GROUP BY 1))
          |  WHERE 2 * cum >= n),
          |seg AS (
          |  SELECT 'R' || CAST(CASE WHEN rec_days <= r_med THEN 1 ELSE 0 END AS VARCHAR)
          |      || 'F' || CAST(CASE WHEN freq >= f_med THEN 1 ELSE 0 END AS VARCHAR)
          |      || 'M' || CAST(CASE WHEN mon_micro >= m_med THEN 1 ELSE 0 END AS VARCHAR)
          |           AS segment,
          |         freq, mon_micro, r_med, f_med, m_med
          |  FROM r, mr, mf, mm)
          |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_users,
          |       CAST(SUM(freq) AS BIGINT) AS total_freq,
          |       CAST(SUM(mon_micro) AS BIGINT) AS total_mon_micro,
          |       MIN(r_med) AS r_med_days, MIN(f_med) AS f_med,
          |       MIN(m_med) AS m_med_micro
          |FROM seg GROUP BY 1
          |ORDER BY segment""".stripMargin),
      (s, dir) => {
        def median(df: org.apache.spark.sql.DataFrame, c: String, as: String) = {
          val cw = Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val tw = Window
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
          df.groupBy(col(c).as("v")).agg(count(lit(1)).as("c"))
            .withColumn("cum", sum(col("c")).over(cw))
            .withColumn("n", sum(col("c")).over(tw))
            .filter(col("cum") * 2 >= col("n"))
            .agg(min(col("v")).as(as))
        }
        val u = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(count(lit(1)).as("freq"),
            sum(floor(col("value") * 1000000L).cast("long")).as("mon_micro"),
            max(floor(expr("unix_timestamp(ts)")).cast("long")).as("last_s"))
        val anchor = u.agg(max("last_s").as("anchor_s"))
        val r = u.crossJoin(broadcast(anchor))
          .select(col("user_id"),
            expr("(anchor_s - last_s) div 86400").as("rec_days"),
            col("freq"), col("mon_micro"))
          // four consumers (three median frames + the segment pass):
          // materialize the user frame once
          .cutLineage()
        val seg = r
          .crossJoin(broadcast(median(r, "rec_days", "r_med")))
          .crossJoin(broadcast(median(r, "freq", "f_med")))
          .crossJoin(broadcast(median(r, "mon_micro", "m_med")))
          .select(
            concat(lit("R"),
              when(col("rec_days") <= col("r_med"), 1).otherwise(0).cast("string"),
              lit("F"),
              when(col("freq") >= col("f_med"), 1).otherwise(0).cast("string"),
              lit("M"),
              when(col("mon_micro") >= col("m_med"), 1).otherwise(0).cast("string"))
              .as("segment"),
            col("freq"), col("mon_micro"),
            col("r_med"), col("f_med"), col("m_med"))
        seg.groupBy("segment")
          .agg(count(lit(1)).as("n_users"),
            sum(col("freq")).as("total_freq"),
            sum(col("mon_micro")).as("total_mon_micro"),
            min(col("r_med")).as("r_med_days"),
            min(col("f_med")).as("f_med"),
            min(col("m_med")).as("m_med_micro"))
          .orderBy("segment")
      }),

    Q(
      "a_group_regression",
      """Group-wise least-squares trend — drift detection per event type:
        |the closed-form slope (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) of value
        |against time. Numerator and denominator are EXACT BIGINTS: x is
        |hours since the group's own first event (recentering bounds the
        |magnitudes so every sum and product stays far inside int64 even
        |at the 5x bench replica), y is value in deci-units; int64 ->
        |double conversion is correctly rounded on both engines even past
        |2^53, so the final division sees bit-identical operands and
        |round-6 is stable. Shape: the per-group t0 aggregate is
        |group-cardinality-sized and broadcasts back onto the stream (the
        |a_outlier_mad discipline); the moment sums are one map-side
        |combinable aggregate; the slope math is row-local on group
        |rows.""".stripMargin,
      Some(
        """WITH mn AS (
          |  SELECT event_type, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t0
          |  FROM events GROUP BY event_type),
          |xy AS (
          |  SELECT e.event_type,
          |         (CAST(floor(epoch(e.ts)) AS BIGINT) - mn.t0) // 3600 AS x,
          |         CAST(floor(e.value * 10) AS BIGINT) AS y
          |  FROM events e JOIN mn ON e.event_type = mn.event_type),
          |s AS (
          |  SELECT event_type,
          |         CAST(COUNT(*) AS BIGINT) AS n,
          |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          |         CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
          |  FROM xy GROUP BY event_type)
          |SELECT event_type, n,
          |       round(CAST(n*sxy - sx*sy AS DOUBLE)
          |             / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope6,
          |       sy
          |FROM s ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val mn = Tables.events(s, dir)
          .groupBy("event_type")
          .agg(min(unix_timestamp(col("ts"))).as("t0"))
        val xy = Tables.events(s, dir)
          .join(broadcast(mn), "event_type")
          .select(col("event_type"),
            expr("(unix_timestamp(ts) - t0) div 3600").as("x"),
            floor(col("value") * 10).cast("long").as("y"))
        xy.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
              .as("slope6"),
            col("sy"))
          .orderBy("event_type")
      }),

    Q(
      "a_market_basket",
      """Association rules over co-purchased parts (market-basket /
        |recommendation mining): for every directed part pair sharing
        |>= 3 orders, support, confidence (P(y|x)) and lift
        |(P(x,y)/P(x)P(y)) in integer ppm — floor division, no float
        |ties. Scale shape: baskets collapse to distinct (order, part)
        |once; the pair self-join reuses that same order-key partitioning
        |(fan-out bounded by basket size, the apriori pair pass); item
        |supports are key-cardinality-sized and BROADCAST back onto the
        |pair frame twice; the basket count is a one-row broadcast. The
        |support >= 3 floor cuts the pair frame before any rule math —
        |the standard apriori prune.""".stripMargin,
      Some(
        """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
          |nn AS (SELECT COUNT(DISTINCT o) AS n FROM op),
          |ic AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS sup FROM op GROUP BY p),
          |pr AS (
          |  SELECT a.p AS x, b.p AS y, CAST(COUNT(*) AS BIGINT) AS sup_xy
          |  FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
          |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
          |SELECT pr.x, pr.y, pr.sup_xy, ix.sup AS sup_x, iy.sup AS sup_y,
          |       pr.sup_xy * 1000000 // ix.sup AS conf_ppm,
          |       pr.sup_xy * nn.n * 1000000 // (ix.sup * iy.sup) AS lift_ppm
          |FROM pr JOIN ic ix ON pr.x = ix.p JOIN ic iy ON pr.y = iy.p CROSS JOIN nn
          |ORDER BY x, y""".stripMargin),
      (s, dir) => {
        // materialized once: the basket frame feeds FOUR consumers (the
        // basket count, item supports, and both self-join sides) — only
        // the self-join shared an exchange, so the scan + distinct ran
        // three times without the cut
        val op = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
          .cutLineage()
        val nn = op.agg(countDistinct(col("o")).as("n"))
        val ic = op.groupBy("p").agg(count(lit(1)).as("sup"))
        val pr = op.as("a")
          .join(op.as("b"), col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
          .groupBy(col("a.p").as("x"), col("b.p").as("y"))
          .agg(count(lit(1)).as("sup_xy"))
          .filter(col("sup_xy") >= 3)
        pr.join(broadcast(ic.select(col("p").as("x"), col("sup").as("sup_x"))), "x")
          .join(broadcast(ic.select(col("p").as("y"), col("sup").as("sup_y"))), "y")
          .crossJoin(broadcast(nn))
          .select(col("x"), col("y"), col("sup_xy"), col("sup_x"), col("sup_y"),
            expr("sup_xy * 1000000 div sup_x").as("conf_ppm"),
            expr("sup_xy * n * 1000000 div (sup_x * sup_y)").as("lift_ppm"))
          .orderBy("x", "y")
      }),

    Q(
      "w_markov_transitions",
      """Event-type transition matrix (first-order Markov model of user
        |behavior — the path-analysis / next-event-prediction primitive):
        |per user, each event pairs with its predecessor in deterministic
        |(ts, event_id) order; transition counts and row-stochastic
        |probabilities in integer ppm, with the artificial '<start>'
        |state marking session entries. Scale shape: ONE user-key shuffle
        |feeds the lag window; the (from, to) aggregate collapses to the
        |state-space square (25 + starts); the per-from normalization is
        |a window over THAT collapsed frame — never over events.""".stripMargin,
      Some(
        """WITH seq AS (
          |  SELECT user_id, event_type,
          |         LAG(event_type) OVER (PARTITION BY user_id
          |                               ORDER BY ts, event_id) AS prev
          |  FROM events),
          |tr AS (
          |  SELECT COALESCE(prev, '<start>') AS from_t, event_type AS to_t,
          |         CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM seq GROUP BY 1, 2)
          |SELECT from_t, to_t, cnt,
          |       cnt * 1000000 // CAST(SUM(cnt) OVER (PARTITION BY from_t) AS BIGINT)
          |         AS p_ppm
          |FROM tr ORDER BY from_t, to_t""".stripMargin),
      (s, dir) => {
        val uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val tr = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            lag(col("event_type"), 1).over(uw).as("prev"))
          .groupBy(coalesce(col("prev"), lit("<start>")).as("from_t"),
            col("event_type").as("to_t"))
          .agg(count(lit(1)).as("cnt"))
        tr.withColumn("tot", sum(col("cnt")).over(Window.partitionBy("from_t")))
          .select(col("from_t"), col("to_t"), col("cnt"),
            expr("cnt * 1000000 div tot").as("p_ppm"))
          .orderBy("from_t", "to_t")
      }),

    Q(
      "w_wow_change",
      """Week-over-week change report — the trend dashboard staple: weekly
        |event counts and floor-micro value totals per event type, with
        |the relative change vs the previous week in integer ppm
        |(NULL for each type's first week). The heavy work is one
        |map-side-combinable (type, week) aggregate; the lag window runs
        |over the COLLAPSED weekly frame (types x weeks rows), partitioned
        |by type — never over events.""".stripMargin,
      Some(
        """WITH w AS (
          |  SELECT event_type, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk,
          |         CAST(COUNT(*) AS BIGINT) AS n,
          |         CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS v_micro
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, wk, n, v_micro,
          |       (v_micro - LAG(v_micro) OVER tw) * 1000000
          |         // LAG(v_micro) OVER tw AS wow_ppm
          |FROM w WINDOW tw AS (PARTITION BY event_type ORDER BY wk)
          |ORDER BY event_type, wk""".stripMargin),
      (s, dir) => {
        val tw = Window.partitionBy("event_type").orderBy("wk")
        Tables.events(s, dir)
          .groupBy(col("event_type"), date_trunc("week", col("ts")).as("wk"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 1000000L).cast("long")).as("v_micro"))
          .withColumn("prev", lag(col("v_micro"), 1).over(tw))
          .withColumn("wow_ppm",
            expr("(v_micro - prev) * 1000000 div prev"))
          .select(col("event_type"), col("wk"), col("n"), col("v_micro"),
            col("wow_ppm"))
          .orderBy("event_type", "wk")
      }),

    Q(
      "a_log_histogram",
      """Order-of-magnitude value profiling — the log-scale histogram a
        |data-quality sweep uses to spot unit errors and outlier decades:
        |per event type, counts and extrema per DECIMAL-digit bucket
        |(bucket = number of digits of the floor-micro value — an exact
        |integer log10 both engines compute as string length, no libm
        |log). Scan-side bucketing + one (type, bucket) aggregate; the
        |output frame is types x ~10 decades.""".stripMargin,
      Some(
        """WITH b AS (
          |  SELECT event_type,
          |         length(CAST(CAST(floor(value * 1000000) AS BIGINT) AS VARCHAR))
          |           AS decade,
          |         CAST(floor(value * 1000000) AS BIGINT) AS vm
          |  FROM events)
          |SELECT event_type, CAST(decade AS BIGINT) AS decade,
          |       CAST(COUNT(*) AS BIGINT) AS n,
          |       MIN(vm) AS v_min, MAX(vm) AS v_max
          |FROM b GROUP BY 1, 2
          |ORDER BY event_type, decade""".stripMargin),
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            length(floor(col("value") * 1000000L).cast("long").cast("string"))
              .cast("long").as("decade"),
            floor(col("value") * 1000000L).cast("long").as("vm"))
          .groupBy("event_type", "decade")
          .agg(count(lit(1)).as("n"),
            min(col("vm")).as("v_min"), max(col("vm")).as("v_max"))
          .orderBy("event_type", "decade")),

    Q(
      "a_chi_square",
      """Chi-square independence test on the event-type x day-of-week
        |contingency table — the "is behavior uniform across the week"
        |data-quality question. Every cell emits its observed count,
        |expected count (milli-units) and chi-square CONTRIBUTION in
        |integer ppm: (obs*N - rt*ct)^2 * 10^6 div (N*rt*ct), with the
        |square widened through DECIMAL/HUGEINT so the arithmetic cannot
        |overflow at any replica scale; because every contribution is an
        |exact integer, the statistic is a plain order-independent SUM of
        |the output column. One (type, dow) aggregate collapses the
        |events; the row/column/grand totals are windows over that
        |35-cell frame (the t_vocab_topk post-agg rationale), never over
        |events.""".stripMargin,
      Some(
        """WITH c AS (
          |  SELECT event_type, CAST(date_part('dow', ts) AS BIGINT) AS dow,
          |         CAST(COUNT(*) AS BIGINT) AS obs
          |  FROM events GROUP BY 1, 2),
          |t AS (
          |  SELECT event_type, dow, obs,
          |         CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
          |         CAST(SUM(obs) OVER (PARTITION BY dow) AS BIGINT) AS ct,
          |         CAST(SUM(obs) OVER () AS BIGINT) AS n
          |  FROM c),
          |d AS (SELECT *, obs * n - rt * ct AS df FROM t)
          |SELECT event_type, dow, obs,
          |       rt * ct * 1000 // n AS exp_milli,
          |       CAST(CAST(df AS HUGEINT) * df * 1000000 // (CAST(n AS HUGEINT) * rt * ct)
          |            AS BIGINT) AS chi2_ppm
          |FROM d ORDER BY event_type, dow""".stripMargin),
      (s, dir) => {
        val c = Tables.events(s, dir)
          .groupBy(col("event_type"),
            (dayofweek(col("ts")) - 1).cast("long").as("dow"))
          .agg(count(lit(1)).as("obs"))
        c.withColumn("rt", sum(col("obs")).over(Window.partitionBy("event_type")))
          .withColumn("ct", sum(col("obs")).over(Window.partitionBy("dow")))
          .withColumn("n", sum(col("obs")).over(
            Window.partitionBy().orderBy().rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("df", expr("obs * n - rt * ct"))
          .select(col("event_type"), col("dow"), col("obs"),
            expr("rt * ct * 1000 div n").as("exp_milli"),
            expr("""cast((cast(df as decimal(19,0)) * df * 1000000)
                   |div (cast(n as decimal(19,0)) * rt * ct) as bigint)"""
              .stripMargin).as("chi2_ppm"))
          .orderBy("event_type", "dow")
      }),

    Q(
      "w_seasonal_deviation",
      """Deviation from the seasonal (hour-of-day) profile — burst
        |detection's calendar-aware sibling: each (type, hour) count is
        |judged against the mean of ITS OWN hour-of-day across the
        |corpus (the 8am slot compares to other 8am slots, not to 3am),
        |so daily cycles stop masquerading as anomalies. The profile is
        |a (type, hour-of-day) aggregate — 120 rows at any corpus
        |size — broadcast back onto the collapsed hourly frame; the
        |deviation test cross-multiplies in exact integers
        |(2·n·prof_n >= 3·prof_sum, a 1.5x seasonal excess). Output:
        |every exceeding hour with its count, profile mean context, and
        |ratio in ppm.""".stripMargin,
      Some(
        """WITH h AS (
          |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us,
          |         CAST(hour(ts) AS INT) AS hod,
          |         CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2, 3),
          |prof AS (
          |  SELECT event_type, hod,
          |         CAST(SUM(n) AS BIGINT) AS prof_sum,
          |         CAST(COUNT(*) AS BIGINT) AS prof_n
          |  FROM h GROUP BY 1, 2)
          |SELECT h.event_type, h.hour_us, h.n, p.prof_sum, p.prof_n,
          |       CAST(h.n * p.prof_n * 1000000 // p.prof_sum AS BIGINT)
          |         AS ratio_ppm
          |FROM h JOIN prof p
          |  ON h.event_type = p.event_type AND h.hod = p.hod
          |WHERE 2 * h.n * p.prof_n >= 3 * p.prof_sum
          |ORDER BY h.event_type, hour_us""".stripMargin),
      (s, dir) => {
        val h = Tables.events(s, dir)
          .withColumn("hour_us", unix_micros(date_trunc("hour", col("ts"))))
          .withColumn("hod", hour(col("ts")).cast("int"))
          .groupBy("event_type", "hour_us", "hod")
          .agg(count(lit(1)).as("n"))
          // materialized once: both the probe side and the profile derive
          // from this frame — without the checkpoint the profile branch
          // re-scans the corpus and re-runs the hourly agg
          .cutLineage()
        val prof = h.groupBy("event_type", "hod")
          .agg(sum(col("n")).as("prof_sum"), count(lit(1)).as("prof_n"))
        h.join(broadcast(prof), Seq("event_type", "hod"))
          .filter(col("n") * col("prof_n") * 2 >= col("prof_sum") * 3)
          .select(col("event_type"), col("hour_us"), col("n"),
            col("prof_sum"), col("prof_n"),
            expr("n * prof_n * 1000000 div prof_sum").as("ratio_ppm"))
          .orderBy("event_type", "hour_us")
      }),

    Q(
      "a_ab_readout",
      """A/B experiment readout — the experimentation primitive: users
        |assign to arms by a pure hash (md5(user || salt) mod 2 — the
        |same rerun-stable split discipline as every sampler here), and
        |per event type the two arms' per-user event rates compare in
        |exact integer ppm (rate = events·10^6 div users; diff signed).
        |On this synthetic corpus the arms differ only by sampling noise
        |— the A/A-test reading, which is itself the standard harness
        |validation an experimentation platform runs first. Assignment
        |is scan-side; the readout is one (type, arm) aggregate plus a
        |2-row-per-type pivot.""".stripMargin,
      Some(
        """WITH a AS (
          |  SELECT user_id, event_type,
          |         CAST(list_sum(list_transform(range(1, 13),
          |           i -> (strpos('0123456789abcdef',
          |                   substr(md5(CAST(user_id AS VARCHAR) || ':ab'),
          |                          CAST(i AS INTEGER), 1))
          |                 - 1) * power(16, 12 - i))) AS BIGINT) % 2 AS arm
          |  FROM events),
          |g AS (
          |  SELECT event_type, arm,
          |         CAST(COUNT(*) AS BIGINT) AS n_events,
          |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          |  FROM a GROUP BY 1, 2),
          |p AS (
          |  SELECT event_type,
          |         MAX(CASE WHEN arm = 0 THEN n_events END) AS ev0,
          |         MAX(CASE WHEN arm = 0 THEN n_users END) AS u0,
          |         MAX(CASE WHEN arm = 1 THEN n_events END) AS ev1,
          |         MAX(CASE WHEN arm = 1 THEN n_users END) AS u1
          |  FROM g GROUP BY 1)
          |SELECT event_type, ev0, u0, ev1, u1,
          |       CAST(ev0 * 1000000 // u0 AS BIGINT) AS rate0_ppm,
          |       CAST(ev1 * 1000000 // u1 AS BIGINT) AS rate1_ppm,
          |       CAST(ev1 * 1000000 // u1 - ev0 * 1000000 // u0 AS BIGINT)
          |         AS diff_ppm
          |FROM p
          |ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val a = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            (expr("conv(substring(md5(concat(cast(user_id as string), ':ab'))," +
              " 1, 12), 16, 10)").cast("long") % 2).as("arm"))
        val g = a.groupBy("event_type", "arm")
          .agg(count(lit(1)).as("n_events"),
            countDistinct("user_id").as("n_users"))
        g.groupBy("event_type")
          .agg(
            max(when(col("arm") === 0, col("n_events"))).as("ev0"),
            max(when(col("arm") === 0, col("n_users"))).as("u0"),
            max(when(col("arm") === 1, col("n_events"))).as("ev1"),
            max(when(col("arm") === 1, col("n_users"))).as("u1"))
          .select(col("event_type"), col("ev0"), col("u0"), col("ev1"), col("u1"),
            expr("ev0 * 1000000 div u0").as("rate0_ppm"),
            expr("ev1 * 1000000 div u1").as("rate1_ppm"),
            expr("ev1 * 1000000 div u1 - ev0 * 1000000 div u0").as("diff_ppm"))
          .orderBy("event_type")
      }),

    Q(
      "a_autocorrelation",
      """Lag-k autocorrelation of the hourly event series — the
        |seasonality diagnostic (is there an hourly carryover? a daily
        |cycle?) behind forecast and anomaly models: for k = 1 and 24,
        |pair each hour's count with its k-hours-later neighbor (LEAD
        |over the collapsed (type, hour) frame — 720 rows per type at
        |any corpus size), accumulate the five sufficient statistics in
        |one aggregate, and emit the SIGNED SQUARED correlation in exact
        |ppm exactly like a_corr_matrix (cov^2 widened DECIMAL/HUGEINT;
        |sqrt never runs, so no libm divergence surface). Events shuffle
        |once into the hourly frame; everything after is frame-sized.""".stripMargin,
      Some(
        """WITH h AS (
          |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us,
          |         CAST(COUNT(*) AS BIGINT) AS x
          |  FROM events GROUP BY 1, 2),
          |k AS (SELECT unnest([1, 24]) AS lag_k),
          |p AS (
          |  SELECT h.event_type, k.lag_k, h.x,
          |         LEAD(h.x, k.lag_k) OVER (PARTITION BY h.event_type, k.lag_k
          |                                  ORDER BY h.hour_us) AS y
          |  FROM h CROSS JOIN k),
          |m AS (
          |  SELECT event_type, lag_k,
          |         CAST(COUNT(*) AS BIGINT) AS n,
          |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          |         CAST(SUM(x*y) AS BIGINT) AS sxy,
          |         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
          |  FROM p WHERE y IS NOT NULL GROUP BY 1, 2),
          |c AS (
          |  SELECT event_type, lag_k, n,
          |         n*sxy - sx*sy AS num, n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy
          |  FROM m)
          |SELECT event_type, CAST(lag_k AS INT) AS lag_k, n,
          |       CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS sgn,
          |       CASE WHEN dx = 0 OR dy = 0 THEN NULL
          |            ELSE CAST(CAST(num AS HUGEINT) * num * 1000000
          |                      // (CAST(dx AS HUGEINT) * dy) AS BIGINT) END
          |         AS r2_ppm
          |FROM c
          |ORDER BY event_type, lag_k""".stripMargin),
      (s, dir) => {
        val h = Tables.events(s, dir)
          .withColumn("hour_us", unix_micros(date_trunc("hour", col("ts"))))
          .groupBy("event_type", "hour_us")
          .agg(count(lit(1)).as("x"))
        val ks = h.sparkSession.range(0, 1)
          .select(explode(array(lit(1), lit(24))).as("lag_k"))
        // one LEAD window per (type, lag) over the collapsed hourly frame;
        // lead distance must be a literal, so the two lags are separate
        // window columns selected by the exploded lag key
        val w = Window.partitionBy("event_type", "lag_k").orderBy("hour_us")
        val p = h.crossJoin(broadcast(ks))
          .withColumn("y",
            when(col("lag_k") === 1, lead(col("x"), 1).over(w))
              .otherwise(lead(col("x"), 24).over(w)))
          .filter(col("y").isNotNull)
        val m = p.groupBy("event_type", "lag_k")
          .agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(expr("x*y")).as("sxy"),
            sum(expr("x*x")).as("sxx"), sum(expr("y*y")).as("syy"))
        m.select(col("event_type"), col("lag_k").cast("int").as("lag_k"),
            col("n"),
            expr("n*sxy - sx*sy").as("num"),
            expr("n*sxx - sx*sx").as("dx"), expr("n*syy - sy*sy").as("dy"))
          .select(col("event_type"), col("lag_k"), col("n"),
            expr("CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END")
              .as("sgn"),
            expr("""CASE WHEN dx = 0 OR dy = 0 THEN NULL
                   |ELSE cast(cast(num as decimal(38,0)) * num * 1000000
                   |     div (cast(dx as decimal(38,0)) * dy) as bigint)
                   |END""".stripMargin).as("r2_ppm"))
          .orderBy("event_type", "lag_k")
      }),

    Q(
      "w_burst_detection",
      """Traffic burst detection against a trailing baseline — the
        |ops-monitoring sweep (alert when an hour runs >= 1.25x its
        |trailing-24h average): events collapse to the (type, hour)
        |count frame FIRST; the trailing baseline is then a 24-row
        |window over that bounded frame (720 rows per type at any
        |corpus size), and the burst test cross-multiplies in exact
        |integers (4*n*24 >= 5*trailing_sum — no fractional average
        |ever formed). The first 24 hours have no full baseline and are
        |excluded (warm-up convention). Output: every burst hour with
        |its count, baseline sum, and ratio in ppm.""".stripMargin,
      Some(
        """WITH h AS (
          |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us,
          |         CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |w AS (
          |  SELECT event_type, hour_us, n,
          |         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY hour_us
          |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
          |           AS BIGINT) AS base_sum,
          |         CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY hour_us
          |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
          |           AS BIGINT) AS base_n
          |  FROM h)
          |SELECT event_type, hour_us, n, base_sum,
          |       CAST(n * base_n * 1000000 // base_sum AS BIGINT) AS ratio_ppm
          |FROM w
          |WHERE base_n = 24 AND 4 * n * base_n >= 5 * base_sum
          |ORDER BY event_type, hour_us""".stripMargin),
      (s, dir) => {
        val h = Tables.events(s, dir)
          .withColumn("hour_us", unix_micros(date_trunc("hour", col("ts"))))
          .groupBy("event_type", "hour_us")
          .agg(count(lit(1)).as("n"))
        val bw = Window.partitionBy("event_type").orderBy("hour_us")
          .rowsBetween(-24, -1)
        h.withColumn("base_sum", sum(col("n")).over(bw))
          .withColumn("base_n", count(lit(1)).over(bw))
          .filter(col("base_n") === 24 &&
            col("n") * col("base_n") * 4 >= col("base_sum") * 5)
          .select(col("event_type"), col("hour_us"), col("n"), col("base_sum"),
            expr("n * base_n * 1000000 div base_sum").as("ratio_ppm"))
          .orderBy("event_type", "hour_us")
      }),

    Q(
      "a_equidepth_histogram",
      """Equi-depth (equi-height) histogram construction — the planner
        |statistic behind selectivity estimation (a_join_size_est's
        |sibling): 8 buckets over whole-dollar l_extendedprice values
        |where each holds ~N/8 rows. Same collapsed-frame discipline as
        |the weighted median: values collapse to the (dollars, freq)
        |frame first, the
        |cumulative window runs over that bounded frame, and boundary k
        |is the smallest value with cum*8 >= k*N — integer
        |cross-multiplication, no float quantiles. Emits each boundary
        |with its exact cumulative count, so the depth guarantee is
        |visible in the data (skewed freq can overshoot a bucket — the
        |real planner caveat, carried rather than hidden).""".stripMargin,
      Some(
        """WITH v AS (
          |  SELECT CAST(floor(l_extendedprice) AS BIGINT) AS dollars
          |  FROM lineitem),
          |f AS (SELECT dollars, CAST(COUNT(*) AS BIGINT) AS freq FROM v GROUP BY 1),
          |c AS (
          |  SELECT dollars, freq,
          |         CAST(SUM(freq) OVER (ORDER BY dollars
          |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS BIGINT) AS cum,
          |         CAST(SUM(freq) OVER () AS BIGINT) AS n
          |  FROM f),
          |k AS (SELECT unnest(range(1, 9)) AS bucket),
          |b AS (
          |  SELECT k.bucket, MIN(c.dollars) AS boundary_dollars
          |  FROM k JOIN c ON c.cum * 8 >= k.bucket * c.n
          |  GROUP BY 1)
          |SELECT b.bucket, b.boundary_dollars,
          |       MIN(c.cum) AS cum_rows, MIN(c.n) AS n_rows
          |FROM b JOIN c ON c.dollars = b.boundary_dollars
          |GROUP BY 1, 2
          |ORDER BY bucket""".stripMargin),
      (s, dir) => {
        val f = Tables.lineitem(s, dir)
          .select(floor(col("l_extendedprice")).cast("long").as("dollars"))
          .groupBy("dollars").agg(count(lit(1)).as("freq"))
        val cw = Window.orderBy("dollars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val c = f
          .withColumn("cum", sum(col("freq")).over(cw))
          .withColumn("n", sum(col("freq")).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .cutLineage() // value frame: |distinct dollars| rows, built once
        val k = c.sparkSession.range(1, 9).select(col("id").as("bucket"))
        val b = broadcast(k).join(c, col("cum") * 8 >= col("bucket") * col("n"))
          .groupBy("bucket").agg(min(col("dollars")).as("boundary_dollars"))
        b.join(c.select(col("dollars").as("boundary_dollars"), col("cum"),
            col("n")), "boundary_dollars")
          .groupBy("bucket", "boundary_dollars")
          .agg(min(col("cum")).as("cum_rows"), min(col("n")).as("n_rows"))
          .orderBy("bucket")
      }),

    Q(
      "w_streak_detection",
      """Longest consecutive-day activity streak per user — the
        |gaps-and-islands pattern (retention streaks, SLA windows,
        |sensor uptime): collapse events to the distinct (user, day)
        |frame FIRST (the fan-in that makes everything after
        |day-frame-sized), then island id = day - ROW_NUMBER days — a
        |constant within each consecutive run — and one group-by per
        |island + one max per user. All three stages ride a single
        |user-key partitioning over the collapsed frame; events
        |themselves shuffle once into the distinct. Output: per user the
        |longest streak, its start day, and how many distinct islands
        |the activity fragments into (ties on length resolve to the
        |earliest start on both engines via min-struct order).""".stripMargin,
      Some(
        """WITH ud AS (
          |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
          |isl AS (
          |  SELECT user_id, d,
          |         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
          |                  AS INTEGER) AS island
          |  FROM ud),
          |runs AS (
          |  SELECT user_id, island,
          |         CAST(COUNT(*) AS BIGINT) AS len, MIN(d) AS start_d
          |  FROM isl GROUP BY 1, 2),
          |best AS (
          |  SELECT user_id, len, start_d,
          |         ROW_NUMBER() OVER (PARTITION BY user_id
          |                            ORDER BY len DESC, start_d) AS brn,
          |         COUNT(*) OVER (PARTITION BY user_id) AS n_isl
          |  FROM runs)
          |SELECT user_id, len AS best_streak, start_d AS best_start,
          |       CAST(n_isl AS BIGINT) AS n_islands
          |FROM best WHERE brn = 1
          |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val ud = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
        val iw = Window.partitionBy("user_id").orderBy("d")
        val runs = ud
          .withColumn("island",
            expr("date_sub(d, cast(row_number() over " +
              "(partition by user_id order by d) as int))"))
          .groupBy("user_id", "island")
          .agg(count(lit(1)).as("len"), min(col("d")).as("start_d"))
        runs.groupBy("user_id")
          .agg(
            max(col("len")).as("best_streak"),
            // earliest start among the longest runs: min over an
            // order-embedding struct ((-len, start_d) lexicographic)
            min(struct((-col("len")).as("neg"), col("start_d")))
              .getField("start_d").as("best_start"),
            count(lit(1)).as("n_islands"))
          .orderBy("user_id")
      }),

    Q(
      "w_top_paths",
      """Top user journeys — the funnel-path mining query (which opening
        |sequences dominate?): each user's FIRST FIVE events (by ts,
        |event_id) collapse into an ordered path string; paths group and
        |rank by user count. The path build is one user-key window
        |(row_number <= 5) + one user-key agg sharing the same
        |partitioning; path frequencies then aggregate on the tiny
        |distinct-path key space (<= 5^5 + shorter prefixes), so the
        |global ranking sorts a bounded frame no matter how many users
        |exist. Ties broken by path text — a total order, LIMIT 20 is
        |deterministic on both engines.""".stripMargin,
      Some(
        """WITH r AS (
          |  SELECT user_id, event_type,
          |         ROW_NUMBER() OVER (PARTITION BY user_id
          |                            ORDER BY ts, event_id) AS rn
          |  FROM events),
          |paths AS (
          |  SELECT user_id,
          |         string_agg(event_type, '>' ORDER BY rn) AS path
          |  FROM r WHERE rn <= 5 GROUP BY user_id)
          |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
          |FROM paths
          |GROUP BY path
          |ORDER BY n_users DESC, path
          |LIMIT 20""".stripMargin),
      (s, dir) => {
        val uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("rn", row_number().over(uw))
          .filter(col("rn") <= 5)
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("rn"), col("event_type"))))
            .as("steps"))
          .select(concat_ws(">",
            expr("transform(steps, s -> s.event_type)")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(20)
      }),

    Q(
      "a_corr_matrix",
      """Pearson correlation matrix from ONE aggregate pass — the
        |sufficient-statistics pattern every distributed stats library
        |(MLlib Summarizer, datasketches) uses at scale: a single scan
        |accumulates n, sums, squares, and cross-products for
        |(quantity, discount%, tax%) per return flag; every pairwise
        |correlation then derives from the 10 per-group numbers. No
        |second pass, no centering pass — the shuffle carries 10 bigints
        |per group regardless of corpus size. Exactness: sqrt never runs —
        |the output is the SIGNED SQUARED correlation in ppm,
        |sign(cov) * cov^2*10^6 div (var_x*var_y), widened through
        |DECIMAL/HUGEINT (cov^2*10^6 ~ 10^37 at the 5x replica — inside
        |38 digits, the documented bound), so both engines agree to the
        |last bit with zero libm involvement. Zero-variance groups emit
        |NULL rather than dividing.""".stripMargin,
      Some(
        """WITH b AS (
          |  SELECT l_returnflag AS flag,
          |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
          |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y,
          |         CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS z
          |  FROM lineitem),
          |m AS (
          |  SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
          |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          |         CAST(SUM(z) AS BIGINT) AS sz,
          |         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
          |         CAST(SUM(z*z) AS BIGINT) AS szz,
          |         CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*z) AS BIGINT) AS sxz,
          |         CAST(SUM(y*z) AS BIGINT) AS syz
          |  FROM b GROUP BY 1),
          |c AS (
          |  SELECT flag, n,
          |         n*sxy - sx*sy AS nxy, n*sxz - sx*sz AS nxz, n*syz - sy*sz AS nyz,
          |         n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy, n*szz - sz*sz AS dz
          |  FROM m)
          |SELECT flag, n,
          |       CASE WHEN nxy > 0 THEN 1 WHEN nxy < 0 THEN -1 ELSE 0 END AS sgn_qd,
          |       CASE WHEN dx = 0 OR dy = 0 THEN NULL
          |            ELSE CAST(CAST(nxy AS HUGEINT) * nxy * 1000000
          |                      // (CAST(dx AS HUGEINT) * dy) AS BIGINT) END AS r2_ppm_qd,
          |       CASE WHEN nxz > 0 THEN 1 WHEN nxz < 0 THEN -1 ELSE 0 END AS sgn_qt,
          |       CASE WHEN dx = 0 OR dz = 0 THEN NULL
          |            ELSE CAST(CAST(nxz AS HUGEINT) * nxz * 1000000
          |                      // (CAST(dx AS HUGEINT) * dz) AS BIGINT) END AS r2_ppm_qt,
          |       CASE WHEN nyz > 0 THEN 1 WHEN nyz < 0 THEN -1 ELSE 0 END AS sgn_dt,
          |       CASE WHEN dy = 0 OR dz = 0 THEN NULL
          |            ELSE CAST(CAST(nyz AS HUGEINT) * nyz * 1000000
          |                      // (CAST(dy AS HUGEINT) * dz) AS BIGINT) END AS r2_ppm_dt
          |FROM c
          |ORDER BY flag""".stripMargin),
      (s, dir) => {
        val b = Tables.lineitem(s, dir).select(
          col("l_returnflag").as("flag"),
          floor(col("l_quantity") + 0.5).cast("long").as("x"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("y"),
          floor(col("l_tax") * 100 + 0.5).cast("long").as("z"))
        val m = b.groupBy("flag").agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
          sum(expr("x*x")).as("sxx"), sum(expr("y*y")).as("syy"),
          sum(expr("z*z")).as("szz"),
          sum(expr("x*y")).as("sxy"), sum(expr("x*z")).as("sxz"),
          sum(expr("y*z")).as("syz"))
        val c = m.select(col("flag"), col("n"),
          expr("n*sxy - sx*sy").as("nxy"), expr("n*sxz - sx*sz").as("nxz"),
          expr("n*syz - sy*sz").as("nyz"),
          expr("n*sxx - sx*sx").as("dx"), expr("n*syy - sy*sy").as("dy"),
          expr("n*szz - sz*sz").as("dz"))
        def r2(num: String, d1: String, d2: String) =
          expr(s"""CASE WHEN $d1 = 0 OR $d2 = 0 THEN NULL
                  |ELSE cast(cast($num as decimal(38,0)) * $num * 1000000
                  |     div (cast($d1 as decimal(38,0)) * $d2) as bigint)
                  |END""".stripMargin)
        def sgn(num: String) =
          expr(s"CASE WHEN $num > 0 THEN 1 WHEN $num < 0 THEN -1 ELSE 0 END")
        c.select(col("flag"), col("n"),
            sgn("nxy").as("sgn_qd"), r2("nxy", "dx", "dy").as("r2_ppm_qd"),
            sgn("nxz").as("sgn_qt"), r2("nxz", "dx", "dz").as("r2_ppm_qt"),
            sgn("nyz").as("sgn_dt"), r2("nyz", "dy", "dz").as("r2_ppm_dt"))
          .orderBy("flag")
      }),

    Q(
      "w_time_weighted_avg",
      """Time-weighted average — the telemetry/financial aggregate where a
        |value holds UNTIL the next observation (sensor readings, account
        |balances, feature freshness): per user-day, each event's value is
        |weighted by the microseconds until the user's next event that day
        |(LEAD over the (user, day) partition; the day's last reading gets
        |weight 0 under the clipped-span convention), and the average is
        |sum(v·dur)/sum(dur) in exact integer arithmetic — the weighted
        |sum widened through DECIMAL/HUGEINT (v_micro x day-span exceeds
        |2^63) and floored back to micros by integral division.
        |Single-event days (span 0) are excluded rather than emitted as
        |NULL averages. One (user, day)-keyed window + one agg on the same
        |key — at cluster scale both stages ride one bucketing, nothing
        |reshuffles.""".stripMargin,
      Some(
        """WITH e AS (
          |  SELECT user_id, CAST(ts AS DATE) AS d, epoch_us(ts) AS t, event_id,
          |         CAST(floor(value * 1000000) AS BIGINT) AS vm
          |  FROM events),
          |w AS (
          |  SELECT user_id, d, vm,
          |         LEAD(t) OVER (PARTITION BY user_id, d ORDER BY t, event_id) - t
          |           AS dur
          |  FROM e),
          |agg AS (
          |  SELECT user_id, d,
          |         CAST(COUNT(*) AS BIGINT) AS n_events,
          |         CAST(SUM(COALESCE(dur, 0)) AS BIGINT) AS span_us,
          |         SUM(CAST(vm AS HUGEINT) * COALESCE(dur, 0)) AS wsum
          |  FROM w GROUP BY 1, 2)
          |SELECT user_id, d, n_events, span_us,
          |       CAST(wsum // span_us AS BIGINT) AS twa_micro
          |FROM agg WHERE span_us > 0
          |ORDER BY user_id, d""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id", "d").orderBy("t", "event_id")
        val e = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"),
            unix_micros(col("ts")).as("t"), col("event_id"),
            floor(col("value") * 1000000L).cast("long").as("vm"))
          .withColumn("dur", lead(col("t"), 1).over(w) - col("t"))
        e.groupBy("user_id", "d")
          .agg(
            count(lit(1)).as("n_events"),
            sum(coalesce(col("dur"), lit(0L))).as("span_us"),
            sum(expr("cast(vm as decimal(19,0)) * coalesce(dur, 0)")).as("wsum"))
          .filter(col("span_us") > 0)
          .select(col("user_id"), col("d"), col("n_events"), col("span_us"),
            expr("cast(wsum div span_us as bigint)").as("twa_micro"))
          .orderBy("user_id", "d")
      }),

    Q(
      "a_private_agg",
      """Differential-privacy-style bounded-contribution aggregation —
        |the release pattern DP SQL engines (BigQuery DP, Tumult) run:
        |(1) CONTRIBUTION BOUNDING: each user contributes at most k=4
        |events per type (row_number over (user,type) ordered by
        |event_id — deterministic where a DP system would sample;
        |determinism is what makes the oracle byte-exact); (2) CLAMPING:
        |each value clipped to [0, 50] in integer micros; (3) the
        |sensitivity-calibrated noise term, Laplace(Δ/ε) with
        |Δ = k·hi = 2e8 micros and ε = 1, here a DETERMINISTIC
        |hash-derived stand-in (same convention as the multimodal codec
        |stubs: the plumbing — bounding, clamping, sensitivity arithmetic
        |— is real and checked; the sampler is the swappable bit). Scale
        |shape: one (user,type)-keyed window for the cap, one per-type
        |agg; both bucket-able, nothing corpus-sized crosses the wire
        |twice. Output exposes every stage (raw vs clamped vs noised) so
        |the privacy accounting is auditable.""".stripMargin,
      Some(
        """WITH ranked AS (
          |  SELECT event_type, user_id,
          |         CAST(floor(value * 1000000) AS BIGINT) AS vm,
          |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
          |                            ORDER BY event_id) AS rn
          |  FROM events),
          |capped AS (
          |  SELECT event_type, user_id,
          |         vm, LEAST(GREATEST(vm, 0), 50000000) AS vc
          |  FROM ranked WHERE rn <= 4),
          |agg AS (
          |  SELECT event_type,
          |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
          |         CAST(COUNT(*) AS BIGINT) AS n_contrib,
          |         CAST(SUM(vm) AS BIGINT) AS raw_sum_micro,
          |         CAST(SUM(vc) AS BIGINT) AS clamped_sum_micro
          |  FROM capped GROUP BY 1),
          |noised AS (
          |  SELECT *,
          |         CAST(list_sum(list_transform(range(1, 13),
          |             i -> (strpos('0123456789abcdef',
          |                     substr(md5(event_type), CAST(i AS INTEGER), 1)) - 1)
          |                  * power(16, 12 - i))) AS BIGINT)
          |           % 400000001 - 200000000 AS noise_micro
          |  FROM agg)
          |SELECT event_type, n_users, n_contrib, raw_sum_micro,
          |       clamped_sum_micro, noise_micro,
          |       clamped_sum_micro + noise_micro AS dp_sum_micro
          |FROM noised
          |ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
        val capped = Tables.events(s, dir)
          .select(col("event_type"), col("user_id"), col("event_id"),
            floor(col("value") * 1000000L).cast("long").as("vm"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4)
          .withColumn("vc", least(greatest(col("vm"), lit(0L)), lit(50000000L)))
        capped.groupBy("event_type")
          .agg(
            countDistinct("user_id").as("n_users"),
            count(lit(1)).as("n_contrib"),
            sum("vm").as("raw_sum_micro"),
            sum("vc").as("clamped_sum_micro"))
          .withColumn("noise_micro",
            expr("conv(substring(md5(event_type), 1, 12), 16, 10)").cast("long")
              % 400000001L - 200000000L)
          .select(col("event_type"), col("n_users"), col("n_contrib"),
            col("raw_sum_micro"), col("clamped_sum_micro"), col("noise_micro"),
            (col("clamped_sum_micro") + col("noise_micro")).as("dp_sum_micro"))
          .orderBy("event_type")
      }))
}
