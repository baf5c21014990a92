package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators Spark has no built-in for, composed
  * from existing ops per the preference order (SURVEY.md §2.10 / build
  * brief): no custom plan nodes needed, and both compositions are the
  * recognized scale patterns for these shapes.
  */
object AsofRangeQueries {

  val qs: Seq[Q] = Seq(
    Q(
      "j_asof_attribution",
      """As-of join via the union-scan pattern: each purchase event joins
        |the LATEST strictly-earlier view event of the same user
        |(attribution). Implementation: tag views/purchases, sort by
        |(ts, kind) with purchases first at equal timestamps (strict <),
        |and carry the last view via an ignore-nulls window — one shuffle
        |on the user key, linear scan per user, no pairwise blowup. The
        |oracle is DuckDB's native ASOF LEFT JOIN, proving the composition
        |implements the real operator semantics.""".stripMargin,
      Some(
        """WITH views AS (
          |  SELECT user_id, ts, MAX(event_id) AS v_id
          |  FROM events WHERE event_type = 'view'
          |  GROUP BY user_id, ts),
          |purchases AS (
          |  SELECT user_id, ts, event_id, value
          |  FROM events WHERE event_type = 'purchase')
          |SELECT p.event_id, p.user_id,
          |       v.v_id AS attributed_view,
          |       date_diff('second', v.ts, p.ts) AS gap_seconds
          |FROM purchases p ASOF LEFT JOIN views v
          |  ON p.user_id = v.user_id AND v.ts < p.ts
          |ORDER BY p.event_id""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // dedupe views per (user, ts) so "latest" is single-valued
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("event_id").as("v_id"))
          .select(col("user_id"), col("ts"), lit(1).as("kind"),
            struct(col("ts").as("v_ts"), col("v_id")).as("view_info"),
            lit(null).cast("long").as("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(0).as("kind"),
            lit(null).cast("struct<v_ts:timestamp,v_id:bigint>").as("view_info"),
            col("event_id"))
        // purchases sort BEFORE views at equal ts (kind 0 < 1) -> a
        // same-timestamp view is invisible: strict v.ts < p.ts
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        views.unionByName(purchases)
          .withColumn("last_view", last(col("view_info"), ignoreNulls = true).over(w))
          .filter(col("kind") === 0)
          .select(
            col("event_id"), col("user_id"),
            col("last_view.v_id").as("attributed_view"),
            (unix_timestamp(col("ts")) - unix_timestamp(col("last_view.v_ts")))
              .as("gap_seconds"))
          .orderBy("event_id")
      }),

    Q(
      "j_asof_tolerance",
      """As-of join WITH TOLERANCE (pandas merge_asof(tolerance=...)
        |semantics): a purchase is attributed to its latest strictly-earlier
        |view only if that view is at most 10 minutes old — staler matches
        |return NULL, exactly like an unmatched row. Same union-scan
        |composition as j_asof_attribution (one user-key shuffle, linear
        |scan per user, no pairwise blowup); the tolerance is a row-local
        |post-condition on the carried match, so the scale shape is
        |unchanged. Oracle: DuckDB's native ASOF LEFT JOIN with the
        |tolerance applied as a CASE over the matched gap.""".stripMargin,
      Some(
        """WITH views AS (
          |  SELECT user_id, ts, MAX(event_id) AS v_id
          |  FROM events WHERE event_type = 'view'
          |  GROUP BY user_id, ts),
          |purchases AS (
          |  SELECT user_id, ts, event_id, value
          |  FROM events WHERE event_type = 'purchase')
          |SELECT p.event_id, p.user_id,
          |       CASE WHEN date_diff('second', v.ts, p.ts) <= 600
          |            THEN v.v_id END AS attributed_view,
          |       CASE WHEN date_diff('second', v.ts, p.ts) <= 600
          |            THEN date_diff('second', v.ts, p.ts) END AS gap_seconds
          |FROM purchases p ASOF LEFT JOIN views v
          |  ON p.user_id = v.user_id AND v.ts < p.ts
          |ORDER BY p.event_id""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("event_id").as("v_id"))
          .select(col("user_id"), col("ts"), lit(1).as("kind"),
            struct(col("ts").as("v_ts"), col("v_id")).as("view_info"),
            lit(null).cast("long").as("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(0).as("kind"),
            lit(null).cast("struct<v_ts:timestamp,v_id:bigint>").as("view_info"),
            col("event_id"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val gap = unix_timestamp(col("ts")) - unix_timestamp(col("last_view.v_ts"))
        views.unionByName(purchases)
          .withColumn("last_view", last(col("view_info"), ignoreNulls = true).over(w))
          .filter(col("kind") === 0)
          .select(
            col("event_id"), col("user_id"),
            when(gap <= 600, col("last_view.v_id")).as("attributed_view"),
            when(gap <= 600, gap).as("gap_seconds"))
          .orderBy("event_id")
      }),

    Q(
      "j_range_bin_join",
      """Range (interval) self-join via time binning: pairs of same-user
        |events at most 1 hour apart. A naive theta join is a nested-loop
        |cross product; binning ts into hour buckets turns it into an
        |equi-join on (user, bin) probing the event's own and next bin,
        |then an exact residual filter — each qualifying pair matches
        |exactly once (its later event lives in exactly one bin). The
        |oracle is the direct inequality join.""".stripMargin,
      Some(
        """SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
          |       date_diff('second', a.ts, b.ts) AS gap_seconds
          |FROM events a JOIN events b
          |  ON a.user_id = b.user_id
          | AND b.ts >= a.ts AND date_diff('second', a.ts, b.ts) <= 3600
          | AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
          |ORDER BY a_id, b_id""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"),
            floor(unix_timestamp(col("ts")) / 3600).as("bin"))
        val a = ev.select(col("event_id").as("a_id"), col("user_id"),
          col("ts").as("a_ts"), col("bin"))
        val b = ev.select(col("event_id").as("b_id"), col("user_id").as("b_user"),
          col("ts").as("b_ts"), col("bin").as("b_bin"))
        a.withColumn("probe_bin", explode(array(col("bin"), col("bin") + 1)))
          .join(b, col("user_id") === col("b_user") && col("probe_bin") === col("b_bin"))
          .filter(col("b_ts") >= col("a_ts") &&
            (unix_timestamp(col("b_ts")) - unix_timestamp(col("a_ts"))) <= 3600 &&
            (col("a_ts") < col("b_ts") ||
              (col("a_ts") === col("b_ts") && col("a_id") < col("b_id"))))
          .select(col("a_id"), col("b_id"), col("user_id"),
            (unix_timestamp(col("b_ts")) - unix_timestamp(col("a_ts"))).as("gap_seconds"))
          .orderBy("a_id", "b_id")
      }),

    Q(
      "j_multitouch_attribution",
      """LINEAR multi-touch attribution — the ad-tech credit model where
        |every view in the 24h before a purchase shares the conversion
        |equally (contrast j_asof_attribution's winner-take-all last
        |touch). Credits are exact integer ppm: each view gets
        |floor(10^6/n) and the LATEST view absorbs the remainder, so
        |credit per purchase sums to exactly 10^6 — an auditable
        |invariant carried in the data. The engine joins purchases to
        |views through the day-bin decomposition (each purchase probes
        |its two covering day bins on the (user, bin) key; the window
        |predicate then confirms row-locally), the same range-bin shape
        |as j_range_bin_join — never the oracle's all-pairs inequality
        |join; the share window partitions by purchase, conversion-sized
        |keys only.""".stripMargin,
      Some(
        """WITH v AS (
          |  SELECT user_id, event_id AS view_id, epoch_us(ts) AS vt
          |  FROM events WHERE event_type = 'view'),
          |p AS (
          |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pt
          |  FROM events WHERE event_type = 'purchase'),
          |pairs AS (
          |  SELECT p.purchase_id, p.user_id, v.view_id, p.pt, v.vt
          |  FROM p JOIN v ON p.user_id = v.user_id
          |  WHERE v.vt < p.pt AND p.pt - v.vt <= 86400000000),
          |rk AS (
          |  SELECT *,
          |         CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT)
          |           AS n_views,
          |         ROW_NUMBER() OVER (PARTITION BY purchase_id
          |                            ORDER BY vt DESC, view_id DESC) AS rk
          |  FROM pairs)
          |SELECT purchase_id, view_id, user_id, n_views,
          |       CAST(1000000 // n_views
          |            + CASE WHEN rk = 1 THEN 1000000 % n_views ELSE 0 END
          |         AS BIGINT) AS credit_ppm,
          |       (pt - vt) // 1000000 AS gap_s
          |FROM rk
          |ORDER BY purchase_id, view_id""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val v = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("vu"), col("event_id").as("view_id"),
            unix_micros(col("ts")).as("vt"))
          .withColumn("bin", expr("vt div 86400000000"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            unix_micros(col("ts")).as("pt"))
          .withColumn("bin",
            explode(array(expr("pt div 86400000000"),
              expr("pt div 86400000000 - 1"))))
        val pairs = p.join(v,
            col("user_id") === col("vu") && p("bin") === v("bin"))
          .filter(col("vt") < col("pt") &&
            col("pt") - col("vt") <= 86400000000L)
        val pw = Window.partitionBy("purchase_id")
        val rw = pw.orderBy(col("vt").desc, col("view_id").desc)
        pairs
          .withColumn("n_views", count(lit(1)).over(pw))
          .withColumn("rk", row_number().over(rw))
          .select(col("purchase_id"), col("view_id"), col("user_id"),
            col("n_views"),
            (expr("1000000 div n_views") +
              when(col("rk") === 1, expr("1000000 % n_views"))
                .otherwise(0L)).as("credit_ppm"),
            expr("(pt - vt) div 1000000").as("gap_s"))
          .orderBy("purchase_id", "view_id")
      }),

    Q(
      "j_scd2_lookup",
      """Point-in-time (temporal) lookup against SCD2 validity intervals —
        |the "what was each user's status at time T?" join every
        |warehouse audit runs. Dimension versions come from the SHARED
        |scd2Intervals core (k_scd2_intervals); probes are every user at
        |two fixed audit instants. The engine resolves containment with
        |the as-of UNION-SCAN: interval starts and probes interleave on
        |one (user, ts, kind) ordering and an ignore-nulls carry hands
        |each probe the latest version started at-or-before it — one
        |user-key partitioning, linear per user, no inequality join at
        |any scale. Versions sharing a start instant are deduped to the
        |highest run first (same rule both engines), so the carry is
        |deterministic. The oracle is DuckDB's native ASOF JOIN with
        |valid_from <= t — matching rows prove the union-scan implements
        |real temporal-join semantics. Probes before a user's first
        |version drop (inner semantics).""".stripMargin,
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
          |         MIN(ts) AS valid_from
          |  FROM runs GROUP BY user_id, run_id),
          |ivd AS (
          |  SELECT user_id, run_id, status, valid_from FROM (
          |    SELECT iv.*, ROW_NUMBER() OVER (PARTITION BY user_id, valid_from
          |                                    ORDER BY run_id DESC) AS dupr
          |    FROM iv) WHERE dupr = 1),
          |probes AS (
          |  SELECT user_id, t
          |  FROM (SELECT DISTINCT user_id FROM events)
          |  CROSS JOIN (VALUES (TIMESTAMP '2024-01-10 12:00:00'),
          |                     (TIMESTAMP '2024-01-20 12:00:00')) AS pt(t))
          |SELECT p.user_id, p.t AS probe_ts, i.run_id, i.status, i.valid_from
          |FROM probes p ASOF JOIN ivd i
          |  ON p.user_id = i.user_id AND i.valid_from <= p.t
          |ORDER BY p.user_id, probe_ts""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val iv = AggWindowQueries.scd2Intervals(ev)
        val dw = Window.partitionBy("user_id", "valid_from")
          .orderBy(col("run_id").desc)
        val ivd = iv.withColumn("dupr", row_number().over(dw))
          .filter(col("dupr") === 1)
        val probes = ev.select("user_id").distinct()
          .select(col("user_id"),
            explode(array(
              to_timestamp(lit("2024-01-10 12:00:00")),
              to_timestamp(lit("2024-01-20 12:00:00")))).as("t"))
        val left = ivd.select(col("user_id"), col("valid_from").as("ts"),
          lit(0).as("kind"), col("run_id"), col("status"),
          lit(null).cast("timestamp").as("probe_ts"))
        val right = probes.select(col("user_id"), col("t").as("ts"),
          lit(1).as("kind"), lit(null).cast("long").as("run_id"),
          lit(null).cast("string").as("status"), col("t").as("probe_ts"))
        val cw = Window.partitionBy("user_id").orderBy("ts", "kind")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        left.unionByName(right)
          .withColumn("c_run", last(col("run_id"), ignoreNulls = true).over(cw))
          .withColumn("c_status", last(col("status"), ignoreNulls = true).over(cw))
          .withColumn("c_from",
            last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(cw))
          .filter(col("kind") === 1 && col("c_status").isNotNull)
          .select(col("user_id"), col("probe_ts"), col("c_run").as("run_id"),
            col("c_status").as("status"), col("c_from").as("valid_from"))
          .orderBy("user_id", "probe_ts")
      }),

    Q(
      "j_interval_overlap",
      """INTERVAL-OVERLAP join (both sides are intervals, not points):
        |per-user-per-day activity spans [first event, last event] against
        |"incident" hours — (type, hour) windows whose event count is
        |>= 1.25x that type's average hourly rate over the corpus's fixed
        |30-day window, in exact integer cross-multiplication
        |(n*2880 >= 5*total). Engine shape: each span explodes into the
        |<= 24 hour bins it covers (bounded by the day clip) and
        |equi-joins the BROADCAST incident table on the bin — the
        |inequality predicate then confirms true overlap row-locally. The
        |naive inequality join the oracle runs is O(spans x windows);
        |binning makes the engine's cost spans x covered-bins with a
        |broadcast build side bounded by hours x types — the standard
        |range-bin decomposition, here applied interval-to-interval.
        |Half-open semantics: span [s_us, e_us] inclusive instants,
        |window [hour_us, hour_us+3600e6).""".stripMargin,
      Some(
        """WITH sp AS (
          |  SELECT user_id, CAST(ts AS DATE) AS d,
          |         MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us,
          |         CAST(COUNT(*) AS BIGINT) AS span_n
          |  FROM events GROUP BY 1, 2),
          |hr AS (
          |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hour_us,
          |         CAST(COUNT(*) AS BIGINT) AS inc_n
          |  FROM events GROUP BY 1, 2),
          |tot AS (
          |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_type
          |  FROM events GROUP BY 1),
          |inc AS (
          |  SELECT h.event_type, h.hour_us, h.inc_n
          |  FROM hr h JOIN tot t ON h.event_type = t.event_type
          |  WHERE h.inc_n * 2880 >= 5 * t.n_type)
          |SELECT s.user_id, s.d, i.event_type, i.hour_us, s.span_n, i.inc_n
          |FROM sp s JOIN inc i
          |  ON s.s_us < i.hour_us + 3600000000 AND i.hour_us <= s.e_us
          |ORDER BY user_id, d, event_type, hour_us""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val sp = ev
          .withColumn("d", to_date(col("ts")))
          .groupBy("user_id", "d")
          .agg(
            min(unix_micros(col("ts"))).as("s_us"),
            max(unix_micros(col("ts"))).as("e_us"),
            count(lit(1)).as("span_n"))
        val hr = ev
          .withColumn("hour_us", unix_micros(date_trunc("hour", col("ts"))))
          .groupBy("event_type", "hour_us")
          .agg(count(lit(1)).as("inc_n"))
        val tot = ev.groupBy("event_type").agg(count(lit(1)).as("n_type"))
        val inc = hr.join(tot, "event_type")
          .filter(col("inc_n") * 2880 >= col("n_type") * 5)
          .withColumn("hidx", expr("hour_us div 3600000000"))
          .select("hidx", "event_type", "hour_us", "inc_n")
        sp.withColumn("hidx",
            explode(sequence(expr("s_us div 3600000000"), expr("e_us div 3600000000"))))
          .join(broadcast(inc), Seq("hidx"))
          .filter(col("s_us") < col("hour_us") + lit(3600000000L) &&
            col("hour_us") <= col("e_us"))
          .select("user_id", "d", "event_type", "hour_us", "span_n", "inc_n")
          .orderBy("user_id", "d", "event_type", "hour_us")
      }),

    Q(
      "w_max_concurrency",
      """Sweep-line max-concurrency — the interval-stabbing aggregate
        |behind "peak simultaneous sessions/licenses/open orders":
        |each order is an interval [start day, start + 1..30 days)
        |(duration keyed off the order key so both engines derive it
        |closed-form), and the question is the maximum number
        |simultaneously open per priority class and WHEN it first
        |happens. The classic O(n log n) sweep becomes fully
        |distributed by collapsing first: boundary events (+1 at
        |start, -1 at end-exclusive) aggregate to the (priority, day,
        |net-delta) frame — value-domain bounded (~2.4k days) at every
        |corpus size — then ONE cumulative window per priority walks
        |the day line. No interval self-join, no per-row sort: the
        |only shuffles are the delta aggregation and the frame-sized
        |window. Peak day is deterministic (earliest day attaining the
        |max).""".stripMargin,
      Some(
        """WITH iv AS (
          |  SELECT o_orderpriority AS grp,
          |         epoch_us(date_trunc('day', o_orderdate)) // 86400000000 AS s,
          |         epoch_us(date_trunc('day', o_orderdate)) // 86400000000
          |           + (o_orderkey % 30) + 1 AS e
          |  FROM orders),
          |d AS (
          |  SELECT grp, day, CAST(SUM(delta) AS BIGINT) AS delta
          |  FROM (SELECT grp, s AS day, 1 AS delta FROM iv
          |        UNION ALL
          |        SELECT grp, e AS day, -1 AS delta FROM iv)
          |  GROUP BY grp, day),
          |c AS (
          |  SELECT grp, day,
          |         CAST(SUM(delta) OVER (PARTITION BY grp ORDER BY day
          |                               ROWS UNBOUNDED PRECEDING)
          |              AS BIGINT) AS open
          |  FROM d)
          |SELECT grp,
          |       CAST(MAX(open) AS BIGINT) AS max_open,
          |       CAST(MIN(CASE WHEN open = mx THEN day END) AS BIGINT)
          |         AS first_peak_day,
          |       CAST(COUNT(*) AS BIGINT) AS boundary_days
          |FROM (SELECT c.*, MAX(open) OVER (PARTITION BY grp) AS mx FROM c)
          |GROUP BY grp ORDER BY grp""".stripMargin),
      (s, dir) => {
        val iv = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("grp"),
            expr("unix_micros(date_trunc('day', o_orderdate)) div 86400000000")
              .as("s"),
            expr("""unix_micros(date_trunc('day', o_orderdate)) div 86400000000
                   |+ (o_orderkey % 30) + 1""".stripMargin).as("e"))
        val d = iv.select(col("grp"), col("s").as("day"), lit(1L).as("delta"))
          .unionAll(iv.select(col("grp"), col("e").as("day"),
            lit(-1L).as("delta")))
          .groupBy("grp", "day")
          .agg(sum("delta").as("delta"))
        val wCum = Window.partitionBy("grp").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val c = d.withColumn("open", sum("delta").over(wCum))
        c.withColumn("mx", max("open").over(Window.partitionBy("grp")))
          .groupBy("grp")
          .agg(max("open").as("max_open"),
            min(when(col("open") === col("mx"), col("day")))
              .as("first_peak_day"),
            count(lit(1)).as("boundary_days"))
          .orderBy("grp")
      }),

    Q(
      "w_littles_law",
      """Little's-law consistency readout (L = lambda x W) over the same
        |order intervals as w_max_concurrency — the queueing-theory
        |invariant an ops dashboard checks before trusting either
        |number: time-average WIP L is computed via the SWEEP INTEGRAL
        |(sum over boundary segments of open x segment length, from the
        |cumulative +1/-1 walk and ONE LEAD per priority over the
        |day-domain frame), while arrival rate lambda and mean
        |residence W come straight from the duration sums — two
        |INDEPENDENT computation paths whose day-granular forms are
        |exactly equal (integral_dt = sum of durations, end-exclusive),
        |so the output carries both integrals and their difference
        |pinned to ZERO by the hash — the cross-check, not just the
        |numbers. L, lambda (per kilo-day), W in exact micro-units via
        |floor division over the observed span.""".stripMargin,
      Some(
        """WITH iv AS (
          |  SELECT o_orderpriority AS grp,
          |         epoch_us(date_trunc('day', o_orderdate)) // 86400000000 AS s,
          |         epoch_us(date_trunc('day', o_orderdate)) // 86400000000
          |           + (o_orderkey % 30) + 1 AS e
          |  FROM orders),
          |st AS (
          |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
          |         CAST(SUM(e - s) AS BIGINT) AS sum_dur,
          |         CAST(MAX(e) - MIN(s) AS BIGINT) AS span
          |  FROM iv GROUP BY 1),
          |d AS (
          |  SELECT grp, day, CAST(SUM(delta) AS BIGINT) AS delta
          |  FROM (SELECT grp, s AS day, 1 AS delta FROM iv
          |        UNION ALL SELECT grp, e AS day, -1 AS delta FROM iv)
          |  GROUP BY grp, day),
          |c AS (
          |  SELECT grp, day,
          |         CAST(SUM(delta) OVER (PARTITION BY grp ORDER BY day
          |                               ROWS UNBOUNDED PRECEDING)
          |              AS BIGINT) AS open,
          |         LEAD(day) OVER (PARTITION BY grp ORDER BY day) AS nxt
          |  FROM d),
          |integ AS (
          |  SELECT grp,
          |         CAST(SUM(CASE WHEN nxt IS NULL THEN 0
          |                       ELSE open * (nxt - day) END) AS BIGINT)
          |           AS sweep_integral
          |  FROM c GROUP BY grp)
          |SELECT st.grp, st.n, st.span, st.sum_dur, i.sweep_integral,
          |       CAST(i.sweep_integral - st.sum_dur AS BIGINT) AS integral_gap,
          |       CAST(i.sweep_integral * 1000000 // st.span AS BIGINT)
          |         AS l_micro,
          |       CAST(st.n * 1000000000 // st.span AS BIGINT)
          |         AS lambda_per_kday,
          |       CAST(st.sum_dur * 1000000 // st.n AS BIGINT) AS w_micro
          |FROM st JOIN integ i ON i.grp = st.grp
          |ORDER BY st.grp""".stripMargin),
      (s, dir) => {
        val iv = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("grp"),
            expr("unix_micros(date_trunc('day', o_orderdate)) div 86400000000")
              .as("s"),
            expr("""unix_micros(date_trunc('day', o_orderdate)) div 86400000000
                   |+ (o_orderkey % 30) + 1""".stripMargin).as("e"))
        val st = iv.groupBy("grp")
          .agg(count(lit(1)).as("n"),
            sum(col("e") - col("s")).as("sum_dur"),
            (max("e") - min("s")).as("span"))
        val d = iv.select(col("grp"), col("s").as("day"), lit(1L).as("delta"))
          .unionAll(iv.select(col("grp"), col("e").as("day"),
            lit(-1L).as("delta")))
          .groupBy("grp", "day")
          .agg(sum("delta").as("delta"))
        val wCum = Window.partitionBy("grp").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wOrd = Window.partitionBy("grp").orderBy("day")
        val integ = d
          .withColumn("open", sum("delta").over(wCum))
          .withColumn("nxt", lead("day", 1).over(wOrd))
          .groupBy("grp")
          .agg(sum(when(col("nxt").isNull, 0L)
            .otherwise(col("open") * (col("nxt") - col("day"))))
            .as("sweep_integral"))
        st.join(integ, "grp")
          .select(col("grp"), col("n"),
            col("span"), col("sum_dur").cast("long").as("sum_dur"),
            col("sweep_integral").cast("long").as("sweep_integral"),
            (col("sweep_integral") - col("sum_dur")).cast("long")
              .as("integral_gap"),
            expr("cast(sweep_integral * 1000000 div span as bigint)")
              .as("l_micro"),
            expr("cast(n * 1000000000 div span as bigint)")
              .as("lambda_per_kday"),
            expr("cast(sum_dur * 1000000 div n as bigint)").as("w_micro"))
          .orderBy("grp")
      }))
}
