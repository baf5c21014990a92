package graft.queries

import graft.ops.Lineage._
import graft.functions.Sharding
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical testing / classic-operator extensions: distribution
  * comparison (Kolmogorov-Smirnov, Mann-Whitney), the skyline (Pareto
  * frontier) operator, CUBE margins, multi-resolution (Haar) decomposition,
  * OHLC/VWAP bars, CUSUM change detection, and readability scoring.
  *
  * These extend the reference's report/reconciliation surface (SURVEY.md
  * §2.5/§2.6 — the reference stops at counts, pivots and status ladders,
  * /root/reference/backend/main.py:384-409) with the inferential and
  * time-series readouts an analytics consumer of the same data asks next.
  *
  * Numeric discipline is the catalog-wide one (see [[Q]]): every statistic
  * is carried in exact integer micro/milli/ppm units via cross-multiplied
  * comparisons and `div`/`//` floor division on non-negative operands, so
  * the DuckDB hash-compare pins the math bit for bit — no float tolerance
  * anywhere. Scale shape: every query collapses the fact table to a
  * key-cardinality frame (distinct values per group, daily rollups, or the
  * part dimension) BEFORE any window runs, so the windows cost
  * collapsed-frame-sized sorts at any corpus size, and all windows are
  * PARTITIONED — no global single-partition pass.
  */
object StatsQueries {

  val qs: Seq[Q] = Seq(
    Q(
      "a_ks_test",
      """Two-sample Kolmogorov-Smirnov test per order priority: does the
        |total-price distribution of finished ('F') orders differ from
        |open/pending ones? The exact D statistic = max |F1(x) - F2(x)|
        |over the pooled support, computed WITHOUT a per-row sort: the
        |corpus first collapses to per-(group, distinct-cents) side
        |counts (the value domain, not the row count, bounds the window
        |frame), cumulative counts run per-group ordered by value, and
        |D's numerator max|f1*n2 - f2*n1| stays in exact integers —
        |ks_ppm = numerator*10^6 div (n1*n2) widened through
        |DECIMAL/HUGEINT so no replica scale can overflow it. The
        |per-group window is the unavoidable order statistic; it runs
        |over distinct price points only.""".stripMargin,
      Some(
        """WITH v AS (
          |  SELECT o_orderpriority AS grp,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
          |              AS BIGINT) AS c1,
          |         CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
          |              AS BIGINT) AS c2
          |  FROM orders GROUP BY 1, 2),
          |cw AS (
          |  SELECT grp, cents,
          |         SUM(c1) OVER (PARTITION BY grp ORDER BY cents
          |                       ROWS UNBOUNDED PRECEDING) AS f1,
          |         SUM(c2) OVER (PARTITION BY grp ORDER BY cents
          |                       ROWS UNBOUNDED PRECEDING) AS f2,
          |         SUM(c1) OVER (PARTITION BY grp) AS n1,
          |         SUM(c2) OVER (PARTITION BY grp) AS n2
          |  FROM v)
          |SELECT grp, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
          |       CAST(MAX(ABS(f1 * n2 - f2 * n1)) AS BIGINT) AS ks_num,
          |       CAST(CAST(MAX(ABS(f1 * n2 - f2 * n1)) AS HUGEINT) * 1000000
          |            // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS ks_ppm
          |FROM cw GROUP BY grp, n1, n2 ORDER BY grp""".stripMargin),
      (s, dir) => {
        val v = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("grp"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"),
            when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("i1"),
            when(col("o_orderstatus") =!= "F", 1L).otherwise(0L).as("i2"))
          .groupBy("grp", "cents")
          .agg(sum("i1").as("c1"), sum("i2").as("c2"))
        val wCum = Window.partitionBy("grp").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("grp")
        v.withColumn("f1", sum("c1").over(wCum))
          .withColumn("f2", sum("c2").over(wCum))
          .withColumn("n1", sum("c1").over(wAll))
          .withColumn("n2", sum("c2").over(wAll))
          .groupBy("grp", "n1", "n2")
          .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
            .as("ks_num"))
          .select(col("grp"), col("n1"), col("n2"), col("ks_num"),
            expr("""cast((cast(ks_num as decimal(38,0)) * 1000000)
                   |div (cast(n1 as decimal(38,0)) * n2) as bigint)"""
              .stripMargin).as("ks_ppm"))
          .orderBy("grp")
      }),

    Q(
      "a_mann_whitney",
      """Mann-Whitney U (Wilcoxon rank-sum) per line status: do returned
        |('R') items ship in different quantities than non-returned
        |('N') ones? Rank-based, so it needs the pooled ordering — but
        |never a per-row sort: the corpus collapses to per-(group,
        |distinct-quantity) side counts first, and tie-corrected average
        |ranks come from ONE cumulative window over distinct values,
        |DOUBLED to stay integral (avg rank of a tie run of t after
        |prev rows = prev + (t+1)/2, so 2*rank = 2*prev + t + 1 exactly).
        |Outputs the doubled rank sum, doubled U, and the AUC effect size
        |U/(n1*n2) in exact ppm (floor over DECIMAL/HUGEINT-widened
        |cross-products). The probability-of-superiority readout the
        |reference's count reports can't give.""".stripMargin,
      Some(
        """WITH v AS (
          |  SELECT l_linestatus AS grp,
          |         CAST(floor(l_quantity * 1000000) AS BIGINT) AS val,
          |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          |              AS BIGINT) AS c1,
          |         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
          |              AS BIGINT) AS c2
          |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1, 2),
          |cw AS (
          |  SELECT grp, val, c1, c2,
          |         SUM(c1 + c2) OVER (PARTITION BY grp ORDER BY val
          |                            ROWS UNBOUNDED PRECEDING)
          |           - (c1 + c2) AS prev,
          |         SUM(c1) OVER (PARTITION BY grp) AS n1,
          |         SUM(c2) OVER (PARTITION BY grp) AS n2
          |  FROM v),
          |r AS (
          |  SELECT grp, n1, n2,
          |         SUM(c1 * (2 * prev + c1 + c2 + 1)) AS two_r1
          |  FROM cw GROUP BY 1, 2, 3)
          |SELECT grp, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
          |       CAST(two_r1 AS BIGINT) AS two_r1,
          |       CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS two_u1,
          |       CAST(CAST(two_r1 - n1 * (n1 + 1) AS HUGEINT) * 1000000
          |            // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS auc_ppm
          |FROM r ORDER BY grp""".stripMargin),
      (s, dir) => {
        val v = Tables.lineitem(s, dir)
          .filter(col("l_returnflag").isin("R", "N"))
          .select(col("l_linestatus").as("grp"),
            floor(col("l_quantity") * 1000000L).cast("long").as("val"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("i1"),
            when(col("l_returnflag") === "N", 1L).otherwise(0L).as("i2"))
          .groupBy("grp", "val")
          .agg(sum("i1").as("c1"), sum("i2").as("c2"))
        val wCum = Window.partitionBy("grp").orderBy("val")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("grp")
        v.withColumn("prev",
            sum(col("c1") + col("c2")).over(wCum) - (col("c1") + col("c2")))
          .withColumn("n1", sum("c1").over(wAll))
          .withColumn("n2", sum("c2").over(wAll))
          .groupBy("grp", "n1", "n2")
          .agg(sum(col("c1") * (lit(2) * col("prev") + col("c1") + col("c2")
            + 1)).as("two_r1"))
          .select(col("grp"), col("n1"), col("n2"), col("two_r1"),
            (col("two_r1") - col("n1") * (col("n1") + 1)).as("two_u1"))
          .withColumn("auc_ppm",
            expr("""cast((cast(two_u1 as decimal(38,0)) * 1000000)
                   |div (2 * cast(n1 as decimal(38,0)) * n2) as bigint)"""
              .stripMargin))
          .orderBy("grp")
      }),

    Q(
      "a_pareto_skyline",
      """The SKYLINE operator (Borzsonyi et al. 2001) — per-brand Pareto
        |frontier of parts minimizing retail price while maximizing
        |size: a part is dominated if some same-brand part is no more
        |expensive AND no smaller, strictly better in one. The classic
        |formulation is a quadratic self-anti-join; in 2D it collapses
        |to a LINEAR scan: ordered by price, a point survives iff its
        |size strictly exceeds every strictly-cheaper point's max size
        |(a RANGE ... 1 PRECEDING running max — value-based, so equal
        |prices stay out of their own frame) and no same-price point is
        |strictly larger (a per-(brand, price) max). Points pre-collapse
        |to distinct (brand, price, size) with multiplicity, so the
        |windows run over the distinct-point frame and ties on BOTH
        |dimensions are kept — equal points never dominate each other.
        |""".stripMargin,
      Some(
        """WITH p AS (
          |  SELECT p_brand AS grp,
          |         CAST(floor(p_retailprice * 100) AS BIGINT) AS price_c,
          |         CAST(p_size AS BIGINT) AS size_v,
          |         CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM part GROUP BY 1, 2, 3),
          |cw AS (
          |  SELECT grp, price_c, size_v, cnt,
          |         MAX(size_v) OVER (PARTITION BY grp ORDER BY price_c
          |           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |           AS m_lt,
          |         MAX(size_v) OVER (PARTITION BY grp, price_c) AS m_eq
          |  FROM p)
          |SELECT grp, price_c, size_v, cnt
          |FROM cw
          |WHERE (m_lt IS NULL OR m_lt < size_v) AND m_eq = size_v
          |ORDER BY grp, price_c, size_v""".stripMargin),
      (s, dir) => {
        val p = Tables.part(s, dir)
          .select(col("p_brand").as("grp"),
            floor(col("p_retailprice") * 100).cast("long").as("price_c"),
            col("p_size").cast("long").as("size_v"))
          .groupBy("grp", "price_c", "size_v")
          .agg(count(lit(1)).as("cnt"))
        val wLt = Window.partitionBy("grp").orderBy("price_c")
          .rangeBetween(Window.unboundedPreceding, -1)
        val wEq = Window.partitionBy("grp", "price_c")
        p.withColumn("m_lt", max("size_v").over(wLt))
          .withColumn("m_eq", max("size_v").over(wEq))
          .filter((col("m_lt").isNull || col("m_lt") < col("size_v"))
            && col("m_eq") === col("size_v"))
          .select("grp", "price_c", "size_v", "cnt")
          .orderBy("grp", "price_c", "size_v")
      }),

    Q(
      "a_cube_margins",
      """CUBE over (return flag, line status) — all four grouping
        |granularities (detail, both one-way margins, grand total) in one
        |pass with explicit GROUPING() provenance bits, the OLAP margin
        |report the reference builds by issuing separate queries per
        |level. Spark plans a single Expand + one aggregate: the fact
        |table is scanned ONCE for all 2^k granularities, map-side
        |partial aggregation included. NULL group cells coalesce to
        |'ALL' so the output is NULL-free for the driver's sorter;
        |measures stay in exact integer micro/cents units.""".stripMargin,
      Some(
        """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
          |       COALESCE(l_linestatus, 'ALL') AS status,
          |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
          |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
          |       CAST(COUNT(*) AS BIGINT) AS n,
          |       CAST(SUM(CAST(floor(l_quantity * 1000000) AS BIGINT))
          |            AS BIGINT) AS qty_micro,
          |       CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
          |            AS BIGINT) AS price_cents
          |FROM lineitem
          |GROUP BY CUBE (l_returnflag, l_linestatus)
          |ORDER BY flag, status""".stripMargin),
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_linestatus"),
            floor(col("l_quantity") * 1000000L).cast("long").as("qm"),
            floor(col("l_extendedprice") * 100).cast("long").as("pc"))
          .cube("l_returnflag", "l_linestatus")
          .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
            grouping(col("l_linestatus")).cast("long").as("g_status"),
            count(lit(1)).as("n"),
            sum("qm").as("qty_micro"),
            sum("pc").as("price_cents"))
          .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("g_flag"), col("g_status"), col("n"), col("qty_micro"),
            col("price_cents"))
          .orderBy("flag", "status")),

    Q(
      "a_haar_decomposition",
      """Haar wavelet detail coefficients of the per-type daily volume
        |series — the multi-resolution decomposition (Matias et al.,
        |wavelet histograms) that localizes WHEN a series changed and at
        |what time scale: level l splits each 2^l-day block into halves,
        |coefficient = sum(first half) - sum(second half), so a step
        |change lights up coarse levels while a one-day spike lights up
        |level 1. The corpus collapses to (type, day) once; the 6-level
        |expansion happens on that calendar-sized frame via a broadcast
        |6-row level dim (half/full block widths precomputed as exact
        |powers of two — no column-amount bit shifts), and one group-by
        |emits every (type, level, bucket) coefficient in exact micro
        |units. Days rebase against the corpus min day (one-row
        |broadcast) so buckets are alignment-stable.""".stripMargin,
      Some(
        """WITH ev AS (
          |  SELECT event_type,
          |         epoch_us(date_trunc('day', ts)) // 86400000000 AS day_id,
          |         CAST(SUM(CAST(floor(value * 1000000) AS BIGINT))
          |              AS BIGINT) AS v_micro
          |  FROM events GROUP BY 1, 2),
          |b AS (SELECT MIN(day_id) AS d0 FROM ev),
          |lv AS (
          |  SELECT l, CAST(power(2, l - 1) AS BIGINT) AS half,
          |         CAST(power(2, l) AS BIGINT) AS fullw
          |  FROM (SELECT unnest(range(1, 7)) AS l)),
          |e AS (
          |  SELECT ev.event_type, ev.day_id - b.d0 AS d, ev.v_micro,
          |         lv.l, lv.half, lv.fullw
          |  FROM ev CROSS JOIN b CROSS JOIN lv)
          |SELECT event_type, CAST(l AS BIGINT) AS lvl,
          |       CAST(d // fullw AS BIGINT) AS bucket,
          |       CAST(SUM(v_micro * (1 - 2 * ((d // half) % 2)))
          |            AS BIGINT) AS coeff,
          |       CAST(COUNT(*) AS BIGINT) AS n_days
          |FROM e GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"),
            expr("unix_micros(date_trunc('DAY', ts)) div 86400000000")
              .as("day_id"),
            col("value"))
          .groupBy("event_type", "day_id")
          .agg(sum(floor(col("value") * 1000000L).cast("long")).as("v_micro"))
        val b = ev.agg(min("day_id").as("d0"))
        val lv = s.range(1, 7).toDF("l")
          .withColumn("half", expr("cast(pow(2, l - 1) as bigint)"))
          .withColumn("fullw", expr("cast(pow(2, l) as bigint)"))
        ev.crossJoin(broadcast(b))
          .select(col("event_type"), (col("day_id") - col("d0")).as("d"),
            col("v_micro"))
          .crossJoin(broadcast(lv))
          .groupBy(col("event_type"), col("l").as("lvl"),
            expr("d div fullw").as("bucket"))
          .agg(sum(expr("v_micro * (1 - 2 * ((d div half) % 2))")).as("coeff"),
            count(lit(1)).as("n_days"))
          .orderBy("event_type", "lvl", "bucket")
      }),

    Q(
      "w_ohlc_vwap",
      """OHLC/VWAP bars — the financial candlestick rollup: per (type,
        |day), the open (value at earliest (ts, event_id)), high, low,
        |close (latest), count, volume and volume-weighted average in
        |exact micro units. The engine computes open/close WITHOUT any
        |window: min/max over a (ts, event_id, value) STRUCT gives the
        |endpoint values through ordinary hash aggregation — map-side
        |combinable, one shuffle of (type, day) partials, no per-group
        |sort at all (the oracle's row_number formulation is what the
        |engine deliberately avoids). event_id uniqueness makes the
        |endpoints deterministic under ts ties.""".stripMargin,
      Some(
        """WITH b AS (
          |  SELECT event_type,
          |         epoch_us(date_trunc('day', ts)) // 86400000000 AS day_id,
          |         ts, event_id,
          |         CAST(floor(value * 1000000) AS BIGINT) AS vm
          |  FROM events),
          |r AS (
          |  SELECT *,
          |         ROW_NUMBER() OVER (PARTITION BY event_type, day_id
          |                            ORDER BY ts, event_id) AS ra,
          |         ROW_NUMBER() OVER (PARTITION BY event_type, day_id
          |                            ORDER BY ts DESC, event_id DESC) AS rd
          |  FROM b)
          |SELECT event_type, day_id,
          |       CAST(MAX(CASE WHEN ra = 1 THEN vm END) AS BIGINT)
          |         AS open_micro,
          |       MAX(vm) AS high_micro, MIN(vm) AS low_micro,
          |       CAST(MAX(CASE WHEN rd = 1 THEN vm END) AS BIGINT)
          |         AS close_micro,
          |       CAST(COUNT(*) AS BIGINT) AS n,
          |       CAST(SUM(vm) AS BIGINT) AS vol_micro,
          |       CAST(SUM(vm) // COUNT(*) AS BIGINT) AS vwap_micro
          |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            expr("unix_micros(date_trunc('DAY', ts)) div 86400000000")
              .as("day_id"),
            col("ts"), col("event_id"),
            floor(col("value") * 1000000L).cast("long").as("vm"))
          .groupBy("event_type", "day_id")
          .agg(
            min(struct(col("ts"), col("event_id"), col("vm")))
              .getField("vm").as("open_micro"),
            max(col("vm")).as("high_micro"),
            min(col("vm")).as("low_micro"),
            max(struct(col("ts"), col("event_id"), col("vm")))
              .getField("vm").as("close_micro"),
            count(lit(1)).as("n"),
            sum(col("vm")).as("vol_micro"))
          .withColumn("vwap_micro", expr("vol_micro div n"))
          .orderBy("event_type", "day_id")),

    Q(
      "w_cusum_alarm",
      """CUSUM change-point detection per event type — the sequential
        |drift detector burst detection can't replace (a burst test
        |fires on one loud day; CUSUM accumulates small sustained
        |excesses until they cross a threshold). The textbook recurrence
        |S_t = max(0, S_{t-1} + dev_t) looks inherently sequential, but
        |has the exact closed form S_t = P_t - min(0, min_{j<=t} P_j)
        |(prefix sum minus running min of the prefix), so it runs as TWO
        |stacked windows over the (type, day) collapsed frame — no
        |recursion, no UDAF, partitioned per type. Deviations are
        |against the per-type mean daily volume (a same-partition window
        |aggregate, floor division on non-negative totals); alarm fires
        |where the accumulated excess reaches 2 mean-days. All exact
        |integer micro units.""".stripMargin,
      Some(
        """WITH d AS (
          |  SELECT event_type,
          |         epoch_us(date_trunc('day', ts)) // 86400000000 AS day_id,
          |         CAST(SUM(CAST(floor(value * 1000000) AS BIGINT))
          |              AS BIGINT) AS v_micro
          |  FROM events GROUP BY 1, 2),
          |t AS (
          |  SELECT *, CAST(SUM(v_micro) OVER (PARTITION BY event_type)
          |                 // COUNT(*) OVER (PARTITION BY event_type)
          |                 AS BIGINT) AS k_mean
          |  FROM d),
          |p AS (
          |  SELECT *, SUM(v_micro - k_mean) OVER (PARTITION BY event_type
          |            ORDER BY day_id ROWS UNBOUNDED PRECEDING) AS pr
          |  FROM t),
          |c AS (
          |  SELECT *, MIN(pr) OVER (PARTITION BY event_type ORDER BY day_id
          |            ROWS UNBOUNDED PRECEDING) AS runmin
          |  FROM p)
          |SELECT event_type, day_id, v_micro, k_mean,
          |       CAST(pr - LEAST(runmin, 0) AS BIGINT) AS cusum,
          |       CAST(CASE WHEN pr - LEAST(runmin, 0) >= 2 * k_mean
          |                 THEN 1 ELSE 0 END AS BIGINT) AS alarm
          |FROM c ORDER BY event_type, day_id""".stripMargin),
      (s, dir) => {
        val d = Tables.events(s, dir)
          .select(col("event_type"),
            expr("unix_micros(date_trunc('DAY', ts)) div 86400000000")
              .as("day_id"),
            col("value"))
          .groupBy("event_type", "day_id")
          .agg(sum(floor(col("value") * 1000000L).cast("long")).as("v_micro"))
        val wAll = Window.partitionBy("event_type")
        val wCum = Window.partitionBy("event_type").orderBy("day_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.withColumn("tot", sum("v_micro").over(wAll))
          .withColumn("days", count(lit(1)).over(wAll))
          .withColumn("k_mean", expr("tot div days"))
          .withColumn("pr", sum(col("v_micro") - col("k_mean")).over(wCum))
          .withColumn("runmin", min("pr").over(wCum))
          .withColumn("cusum", col("pr") - least(col("runmin"), lit(0L)))
          .select(col("event_type"), col("day_id"), col("v_micro"),
            col("k_mean"), col("cusum"),
            (col("cusum") >= col("k_mean") * 2).cast("long").as("alarm"))
          .orderBy("event_type", "day_id")
      }),

    Q(
      "t_readability",
      """Flesch reading-ease readability scoring per (lang, bucket) —
        |the curation signal between raw length stats and model-based
        |quality: FRE = 206.835 - 1.015*(words/sentences) -
        |84.6*(syllables/word), carried in exact milli-units with floor
        |division on non-negative terms. Sentences count terminal
        |punctuation; unpunctuated text (OCR/ASR shape — and this
        |corpus) falls back to 25-word pseudo-sentences, the standard
        |segmentation fallback, via GREATEST(punct, ceil(words/25), 1).
        |Syllables are vowel-run counts (regexp on the lowered text,
        |identical [aeiouy]+ semantics in both engines). The mean FRE
        |per bucket divides a +10^7-SHIFTED sum so the floor division
        |never sees a negative numerator (floor vs truncate divergence
        |is the cross-engine trap). Everything is row-local until the
        |tiny (lang, bucket) rollup.""".stripMargin,
      Some(
        """WITH d AS (
          |  SELECT doc_id, lang, lower(trim(text)) AS t FROM documents),
          |m AS (
          |  SELECT doc_id, lang,
          |         CAST(len(string_split(t, ' ')) AS BIGINT) AS words,
          |         GREATEST(
          |           CAST(len(t) - len(regexp_replace(t, '[.!?]', '', 'g'))
          |                AS BIGINT),
          |           (CAST(len(string_split(t, ' ')) AS BIGINT) + 24) // 25,
          |           1) AS sents,
          |         GREATEST(CAST(len(regexp_extract_all(t, '[aeiouy]+'))
          |                       AS BIGINT), 1) AS syl
          |  FROM d),
          |f AS (
          |  SELECT lang, words,
          |         206835 - (1015 * words) // sents - (84600 * syl) // words
          |           AS fre_milli
          |  FROM m),
          |b AS (
          |  SELECT lang,
          |         CASE WHEN fre_milli >= 90000 THEN 'very_easy'
          |              WHEN fre_milli >= 70000 THEN 'easy'
          |              WHEN fre_milli >= 50000 THEN 'standard'
          |              WHEN fre_milli >= 30000 THEN 'difficult'
          |              ELSE 'very_hard' END AS bucket,
          |         words, fre_milli
          |  FROM f)
          |SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |       CAST(SUM(words) AS BIGINT) AS words,
          |       CAST(MIN(fre_milli) AS BIGINT) AS fre_min,
          |       CAST(MAX(fre_milli) AS BIGINT) AS fre_max,
          |       CAST(SUM(fre_milli + 10000000) // COUNT(*) - 10000000
          |            AS BIGINT) AS fre_mean_milli
          |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), lower(trim(col("text"))).as("t"))
        val m = d.select(col("lang"),
          size(split(col("t"), " ")).cast("long").as("words"),
          (length(col("t"))
            - length(regexp_replace(col("t"), "[.!?]", ""))).cast("long")
            .as("punct"),
          greatest(
            size(regexp_extract_all(col("t"), lit("[aeiouy]+"), lit(0)))
              .cast("long"), lit(1L)).as("syl"))
          .withColumn("sents",
            greatest(col("punct"), expr("(words + 24) div 25"), lit(1L)))
        val f = m.select(col("lang"), col("words"),
          expr("206835 - (1015 * words) div sents - (84600 * syl) div words")
            .as("fre_milli"))
        f.select(col("lang"),
            when(col("fre_milli") >= 90000, "very_easy")
              .when(col("fre_milli") >= 70000, "easy")
              .when(col("fre_milli") >= 50000, "standard")
              .when(col("fre_milli") >= 30000, "difficult")
              .otherwise("very_hard").as("bucket"),
            col("words"), col("fre_milli"))
          .groupBy("lang", "bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum("words").as("words"),
            min("fre_milli").as("fre_min"),
            max("fre_milli").as("fre_max"),
            expr("cast(sum(fre_milli + 10000000) div count(1) - 10000000 as bigint)")
              .as("fre_mean_milli"))
          .orderBy("lang", "bucket")
      }),

    Q(
      "a_changepoint_binary",
      """Binary-segmentation changepoint detection over the daily order
        |series — the first step of PELT/BinSeg every monitoring stack
        |runs: per order priority, find the day boundary that maximizes
        |the between-segment separation of daily order counts. The
        |corpus collapses to the (priority, day, count) frame FIRST
        |(value-domain bounded — ~2.4k days at any corpus size), prefix
        |sums run in ONE cumulative window per group, and the split
        |score is the exact integer between-group term
        |(SL*nR - SR*nL)^2 div (nL*nR) with the square widened through
        |DECIMAL(38,0)/HUGEINT (counts grow with replica scale; the
        |cross term passes 2^63 near 10x). Argmax is deterministic:
        |max score per group, earliest day on ties. Output: the split
        |day, both segment day-counts, and the exact micro-unit segment
        |means — no float enters at any point.""".stripMargin,
      Some(
        """WITH d AS (
          |  SELECT o_orderpriority AS grp,
          |         epoch_us(date_trunc('day', o_orderdate)) // 86400000000 AS d,
          |         CAST(COUNT(*) AS BIGINT) AS c
          |  FROM orders GROUP BY 1, 2),
          |p AS (
          |  SELECT grp, d, c,
          |         SUM(c) OVER (PARTITION BY grp ORDER BY d
          |                      ROWS UNBOUNDED PRECEDING) AS sl,
          |         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY d) AS nl,
          |         SUM(c) OVER (PARTITION BY grp) AS s,
          |         COUNT(*) OVER (PARTITION BY grp) AS n
          |  FROM d),
          |sc AS (
          |  SELECT grp, d, nl, n - nl AS nr, sl, s - sl AS sr,
          |         CAST(CAST(sl * (n - nl) - (s - sl) * nl AS HUGEINT)
          |              * (sl * (n - nl) - (s - sl) * nl)
          |              // (nl * (n - nl)) AS BIGINT) AS score,
          |         CAST(sl * 1000000 // nl AS BIGINT) AS mean_l_micro,
          |         CAST((s - sl) * 1000000 // (n - nl) AS BIGINT) AS mean_r_micro
          |  FROM p WHERE nl < n),
          |mx AS (
          |  SELECT sc.*, MAX(score) OVER (PARTITION BY grp) AS best
          |  FROM sc)
          |SELECT grp, CAST(d AS BIGINT) AS split_day,
          |       CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
          |       score, mean_l_micro, mean_r_micro
          |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY d) AS rn
          |      FROM mx WHERE score = best)
          |WHERE rn = 1
          |ORDER BY grp""".stripMargin),
      (s, dir) => {
        val d = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("grp"),
            expr("unix_micros(date_trunc('day', o_orderdate)) div 86400000000")
              .as("d"))
          .groupBy("grp", "d")
          .agg(count(lit(1)).as("c"))
        val wCum = Window.partitionBy("grp").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wOrd = Window.partitionBy("grp").orderBy("d")
        val wAll = Window.partitionBy("grp")
        val p = d
          .withColumn("sl", sum("c").over(wCum))
          .withColumn("nl", row_number().over(wOrd).cast("long"))
          .withColumn("s", sum("c").over(wAll))
          .withColumn("n", count(lit(1)).over(wAll))
        val sc = p.filter(col("nl") < col("n"))
          .select(col("grp"), col("d"), col("nl"),
            (col("n") - col("nl")).as("nr"), col("sl"),
            (col("s") - col("sl")).as("sr"),
            expr("""cast(cast(sl * (n - nl) - (s - sl) * nl as decimal(38,0))
                   |* (sl * (n - nl) - (s - sl) * nl)
                   |div (nl * (n - nl)) as bigint)""".stripMargin).as("score"),
            expr("cast(sl * 1000000 div nl as bigint)").as("mean_l_micro"),
            expr("cast((s - sl) * 1000000 div (n - nl) as bigint)")
              .as("mean_r_micro"))
        sc.withColumn("best", max("score").over(Window.partitionBy("grp")))
          .filter(col("score") === col("best"))
          .withColumn("rn",
            row_number().over(Window.partitionBy("grp").orderBy("d")))
          .filter(col("rn") === 1)
          .select(col("grp"), col("d").cast("long").as("split_day"),
            col("nl").as("n_left"), col("nr").as("n_right"),
            col("score"), col("mean_l_micro"), col("mean_r_micro"))
          .orderBy("grp")
      }),

    Q(
      "a_largest_remainder_alloc",
      """Largest-remainder (Hamilton) apportionment — the exact-sum
        |allocation primitive behind budget splits, seat apportionment
        |and pro-rata rounding: 10,000 allocation units distributed
        |across nations proportionally to their customers' order
        |revenue, floors first, then the leftover units awarded one
        |each by descending remainder (nation key breaks ties), so the
        |grand total is EXACTLY 10,000 by construction — the invariant
        |every naive per-row rounding violates. Engine shape: the fact
        |join collapses to a 25-row nation frame before any window;
        |the remainder ranking and the leftover count are windows over
        |that frame; revenue stays in exact cents (the 10^4 x cents
        |cross product is ~3e16 at 10x — inside BIGINT, asserted by
        |the same widened math both engines run). Output carries the
        |allocated units plus the whole-frame allocation total so the
        |hash pins the exact-sum invariant itself.""".stripMargin,
      Some(
        """WITH r AS (
          |  SELECT c.c_nationkey AS nk,
          |         CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
          |              AS BIGINT) AS cents
          |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
          |  GROUP BY 1),
          |q AS (
          |  SELECT nk, cents,
          |         SUM(cents) OVER () AS total,
          |         (10000 * cents) // SUM(cents) OVER () AS fl,
          |         (10000 * cents) % SUM(cents) OVER () AS rem
          |  FROM r),
          |k AS (
          |  SELECT q.*, 10000 - SUM(fl) OVER () AS leftover,
          |         ROW_NUMBER() OVER (ORDER BY rem DESC, nk) AS rk
          |  FROM q)
          |SELECT CAST(nk AS BIGINT) AS nk, n.n_name, cents,
          |       CAST(fl AS BIGINT) AS floor_units,
          |       CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
          |         AS extra,
          |       CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
          |            AS BIGINT) AS units,
          |       CAST(SUM(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
          |            OVER () AS BIGINT) AS total_units
          |FROM k JOIN nation n ON n.n_nationkey = k.nk
          |ORDER BY nk""".stripMargin),
      (s, dir) => {
        val r = Tables.customer(s, dir)
          .join(Tables.orders(s, dir),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nk"))
          .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        val wAll = Window.partitionBy(lit(1))
        val q = r
          .withColumn("total", sum("cents").over(wAll))
          .withColumn("fl", expr("(10000 * cents) div total"))
          .withColumn("rem", expr("(10000 * cents) % total"))
        val k = q
          .withColumn("leftover", lit(10000L) - sum("fl").over(wAll))
          .withColumn("rk", row_number()
            .over(Window.partitionBy(lit(1))
              .orderBy(col("rem").desc, col("nk"))).cast("long"))
          .withColumn("extra",
            when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .withColumn("units", col("fl") + col("extra"))
          .withColumn("total_units", sum("units").over(wAll))
        k.join(broadcast(Tables.nation(s, dir)),
            col("n_nationkey") === col("nk"))
          .select(col("nk").cast("long").as("nk"), col("n_name"),
            col("cents"), col("fl").as("floor_units"), col("extra"),
            col("units"), col("total_units"))
          .orderBy("nk")
      }),

    Q(
      "a_theil_sen_daily",
      """Theil-Sen robust trend estimator per event type — the
        |outlier-resistant slope the monitoring world uses where OLS
        |(a_group_regression) gets dragged by spikes: the median over
        |all pairwise day-slopes of the daily count series. The corpus
        |collapses to the (type, day, count) frame FIRST, so the
        |pairwise stage is a self-join of the DAY DOMAIN (~2.4k rows
        |per type at every corpus size — the pair count is scale-
        |INVARIANT; only the per-day counts grow with data). Slopes are
        |exact micro-units via an explicit two-sided FLOOR division:
        |both engines' native operators (Spark `div`, DuckDB `//`)
        |truncate toward zero, which would round negative slopes UP —
        |the CASE wrapper pins mathematical floor on both engines so
        |the order statistic over mixed-sign slopes is monotone in the
        |true rational value. Median-of-even-count is reported as BOTH middle
        |order statistics (lo/hi) plus their sum — no halving, no
        |float. Deterministic order statistic: slopes ranked with
        |(slope, d1, d2) tiebreak.""".stripMargin,
      Some(
        """WITH d AS (
          |  SELECT event_type AS grp,
          |         epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
          |         CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1, 2),
          |pr AS (
          |  SELECT a.grp, a.d AS d1, b.d AS d2,
          |         (b.c - a.c) * 1000000 AS num, b.d - a.d AS den
          |  FROM d a JOIN d b ON a.grp = b.grp AND b.d > a.d),
          |sl AS (
          |  SELECT grp, d1, d2,
          |         CASE WHEN num >= 0 THEN num // den
          |              ELSE -((-num + den - 1) // den) END AS slope_micro
          |  FROM pr),
          |rk AS (
          |  SELECT grp, slope_micro,
          |         ROW_NUMBER() OVER (PARTITION BY grp
          |                            ORDER BY slope_micro, d1, d2) AS rn,
          |         COUNT(*) OVER (PARTITION BY grp) AS m
          |  FROM sl)
          |SELECT grp, CAST(MAX(m) AS BIGINT) AS m,
          |       CAST(MAX(CASE WHEN rn = (m + 1) // 2 THEN slope_micro END)
          |            AS BIGINT) AS slope_lo,
          |       CAST(MAX(CASE WHEN rn = (m + 2) // 2 THEN slope_micro END)
          |            AS BIGINT) AS slope_hi,
          |       CAST(MAX(CASE WHEN rn = (m + 1) // 2 THEN slope_micro END)
          |            + MAX(CASE WHEN rn = (m + 2) // 2 THEN slope_micro END)
          |            AS BIGINT) AS slope2_micro
          |FROM rk GROUP BY grp ORDER BY grp""".stripMargin),
      (s, dir) => {
        val d = Tables.events(s, dir)
          .select(col("event_type").as("grp"),
            expr("unix_micros(date_trunc('day', ts)) div 86400000000")
              .as("d"))
          .groupBy("grp", "d")
          .agg(count(lit(1)).as("c"))
        val a = d.select(col("grp"), col("d").as("d1"), col("c").as("c1"))
        val b = d.select(col("grp").as("grp_b"), col("d").as("d2"),
          col("c").as("c2"))
        val pr = a.join(b,
            col("grp") === col("grp_b") && col("d2") > col("d1"))
          .select(col("grp"), col("d1"), col("d2"),
            ((col("c2") - col("c1")) * 1000000L).as("num"),
            (col("d2") - col("d1")).as("den"))
        val sl = pr.select(col("grp"), col("d1"), col("d2"),
          expr("""CASE WHEN num >= 0 THEN num div den
                 |ELSE -((-num + den - 1) div den) END""".stripMargin)
            .as("slope_micro"))
        val w = Window.partitionBy("grp")
          .orderBy("slope_micro", "d1", "d2")
        val rk = sl
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("m",
            count(lit(1)).over(Window.partitionBy("grp")))
        rk.groupBy("grp")
          .agg(max("m").cast("long").as("m"),
            max(when(col("rn") === expr("(m + 1) div 2"),
              col("slope_micro"))).as("slope_lo"),
            max(when(col("rn") === expr("(m + 2) div 2"),
              col("slope_micro"))).as("slope_hi"))
          .select(col("grp"), col("m"), col("slope_lo"), col("slope_hi"),
            (col("slope_lo") + col("slope_hi")).as("slope2_micro"))
          .orderBy("grp")
      }),

    Q(
      "a_survival_hazard",
      """Nelson-Aalen cumulative hazard — survival analysis with RIGHT
        |CENSORING, the readout behind "how long until an order
        |fulfills, given many are still open": duration = order day →
        |last ship day, the event is observed only for finished ('F')
        |orders, open orders stay in the risk set through their
        |observed duration (dropping them — the naive mean — biases
        |fulfillment time low). The estimator is a SUM of per-step
        |hazards d_t/n_t, so unlike Kaplan-Meier's product it stays in
        |exact integer ppm (per-term floor, then one cumulative
        |window). Engine shape: one orderkey-keyed aggregate builds
        |durations, the corpus then collapses to the (priority,
        |duration-day) VALUE-DOMAIN frame, and risk sets come from ONE
        |cumulative window over that frame (n_t = total minus prefix-
        |before) — never a per-order theta-join against duration >= t.
        |Output at event times only, as the estimator defines.""".stripMargin,
      Some(
        """WITH dur AS (
          |  SELECT o.o_orderkey, o.o_orderpriority AS grp,
          |         CAST(MAX(epoch_us(date_trunc('day', l.l_shipdate))
          |                // 86400000000)
          |              - epoch_us(date_trunc('day', o.o_orderdate))
          |                // 86400000000 AS BIGINT) AS t,
          |         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS evt
          |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          |  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate,
          |           o.o_orderstatus),
          |f AS (
          |  SELECT grp, t, CAST(SUM(evt) AS BIGINT) AS d,
          |         CAST(COUNT(*) AS BIGINT) AS c
          |  FROM dur GROUP BY 1, 2),
          |r AS (
          |  SELECT grp, t, d,
          |         CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT)
          |           - CAST(SUM(c) OVER (PARTITION BY grp ORDER BY t
          |                ROWS UNBOUNDED PRECEDING) - c AS BIGINT) AS n_risk
          |  FROM f),
          |h AS (
          |  SELECT grp, t, n_risk, d,
          |         CAST(d * 1000000 // n_risk AS BIGINT) AS hazard_ppm
          |  FROM r WHERE d > 0)
          |SELECT grp, t, n_risk, d AS d_events, hazard_ppm,
          |       CAST(SUM(hazard_ppm) OVER (PARTITION BY grp ORDER BY t
          |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumhaz_ppm
          |FROM h ORDER BY grp, t""".stripMargin),
      (s, dir) => {
        val dur = Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_shipdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderpriority").as("grp"),
            col("o_orderdate"), col("o_orderstatus"))
          .agg((max(expr(
            "unix_micros(date_trunc('day', l_shipdate)) div 86400000000"))
            - expr("unix_micros(date_trunc('day', o_orderdate)) div 86400000000"))
            .as("t"))
          .select(col("grp"), col("t"),
            when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("evt"))
        val f = dur.groupBy("grp", "t")
          .agg(sum("evt").as("d"), count(lit(1)).as("c"))
        val wAll = Window.partitionBy("grp")
        val wCum = Window.partitionBy("grp").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val r = f.withColumn("n_risk",
          sum("c").over(wAll) - (sum("c").over(wCum) - col("c")))
        val h = r.filter(col("d") > 0)
          .select(col("grp"), col("t"), col("n_risk").cast("long").as("n_risk"),
            col("d"), expr("cast(d * 1000000 div n_risk as bigint)")
              .as("hazard_ppm"))
        h.withColumn("cumhaz_ppm",
            sum("hazard_ppm").over(wCum).cast("long"))
          .select(col("grp"), col("t"), col("n_risk"),
            col("d").as("d_events"), col("hazard_ppm"), col("cumhaz_ppm"))
          .orderBy("grp", "t")
      }),

    Q(
      "a_capture_recapture",
      """Capture-recapture population estimation (Chapman's corrected
        |Lincoln-Petersen) — the "how many are we NOT seeing" estimator
        |used for coverage auditing (log sampling, dedup completeness):
        |two independent deterministic 25% observers sample the order
        |stream via seeded md5-nibble membership (the same portable
        |hex-nibble construction as the sampling family — reproducible
        |under retries on both engines), and the overlap estimates the
        |true population: N-hat = (n1+1)(n2+1) div (m+1) - 1, exact
        |integers throughout. The TRUE count rides alongside with the
        |absolute error in ppm — the query is its own calibration
        |harness, the pattern a_kmv_distinct set. Engine shape: one
        |scan, the membership flags are row-local expressions, one
        |group-by carries all five sufficient statistics — nothing
        |shuffles but the 5-row priority frame.""".stripMargin,
      Some(
        """WITH s AS (
          |  SELECT o_orderpriority AS grp,
          |         CASE WHEN ((instr('0123456789abcdef',
          |                 substr(md5(CAST(o_orderkey AS VARCHAR) || 'capA'),
          |                        1, 1)) - 1) * 16
          |               + instr('0123456789abcdef',
          |                 substr(md5(CAST(o_orderkey AS VARCHAR) || 'capA'),
          |                        2, 1)) - 1) % 4 = 0
          |              THEN 1 ELSE 0 END AS in_a,
          |         CASE WHEN ((instr('0123456789abcdef',
          |                 substr(md5(CAST(o_orderkey AS VARCHAR) || 'capB'),
          |                        1, 1)) - 1) * 16
          |               + instr('0123456789abcdef',
          |                 substr(md5(CAST(o_orderkey AS VARCHAR) || 'capB'),
          |                        2, 1)) - 1) % 4 = 0
          |              THEN 1 ELSE 0 END AS in_b
          |  FROM orders),
          |m AS (
          |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_true,
          |         CAST(SUM(in_a) AS BIGINT) AS n1,
          |         CAST(SUM(in_b) AS BIGINT) AS n2,
          |         CAST(SUM(in_a * in_b) AS BIGINT) AS m_both
          |  FROM s GROUP BY 1)
          |SELECT grp, n_true, n1, n2, m_both,
          |       CAST((n1 + 1) * (n2 + 1) // (m_both + 1) - 1 AS BIGINT)
          |         AS n_est,
          |       CAST(ABS((n1 + 1) * (n2 + 1) // (m_both + 1) - 1 - n_true)
          |            * 1000000 // n_true AS BIGINT) AS err_ppm
          |FROM m ORDER BY grp""".stripMargin),
      (s, dir) => {
        val sdf = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("grp"),
            when(Sharding.shardOf(col("o_orderkey"), "capA", 4) === 0, 1L)
              .otherwise(0L).as("in_a"),
            when(Sharding.shardOf(col("o_orderkey"), "capB", 4) === 0, 1L)
              .otherwise(0L).as("in_b"))
        sdf.groupBy("grp")
          .agg(count(lit(1)).as("n_true"),
            sum("in_a").as("n1"), sum("in_b").as("n2"),
            sum(col("in_a") * col("in_b")).as("m_both"))
          .select(col("grp"), col("n_true"), col("n1"), col("n2"),
            col("m_both"),
            expr("cast((n1 + 1) * (n2 + 1) div (m_both + 1) - 1 as bigint)")
              .as("n_est"),
            expr("""cast(abs((n1 + 1) * (n2 + 1) div (m_both + 1) - 1 - n_true)
                   |* 1000000 div n_true as bigint)""".stripMargin)
              .as("err_ppm"))
          .orderBy("grp")
      }),

    Q(
      "w_max_drawdown",
      """Maximum drawdown — the risk statistic behind "how far below its
        |running peak has this series fallen" (burn-down monitoring,
        |capacity planning, PnL): computed on the CUSUM-style deviation
        |walk P_t = sum over days of (n_i*D - N) per event type (daily
        |count deviation from the type's mean daily volume, cross-
        |multiplied so no fractional mean is ever formed — the raw
        |cumulative volume is monotone and would make drawdown
        |degenerately zero). Drawdown_t = running-max(P) - P_t; the
        |report is its maximum with the EARLIEST trough day
        |(deterministic argmax). Engine shape: the corpus collapses to
        |the (type, day) value-domain frame, then THREE stacked
        |type-partitioned windows (cumsum, running max, trough argmin)
        |over that frame — the same closed-form discipline as
        |w_cusum_alarm, no recursion, no self-join, frame-sized
        |everything.""".stripMargin,
      Some(
        """WITH d AS (
          |  SELECT event_type AS grp,
          |         epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
          |         CAST(COUNT(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |m AS (
          |  SELECT grp, day, n,
          |         CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS nd,
          |         CAST(SUM(n) OVER (PARTITION BY grp) AS BIGINT) AS tot
          |  FROM d),
          |p AS (
          |  SELECT grp, day,
          |         CAST(SUM(n * nd - tot) OVER (PARTITION BY grp ORDER BY day
          |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS walk
          |  FROM m),
          |r AS (
          |  SELECT grp, day, walk,
          |         CAST(MAX(walk) OVER (PARTITION BY grp ORDER BY day
          |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
          |  FROM p),
          |dd AS (SELECT grp, day, walk, peak, peak - walk AS draw FROM r)
          |SELECT grp,
          |       CAST(MAX(draw) AS BIGINT) AS max_drawdown,
          |       CAST(MIN(CASE WHEN draw = mx THEN day END) AS BIGINT)
          |         AS trough_day,
          |       CAST(COUNT(*) AS BIGINT) AS n_days
          |FROM (SELECT dd.*, MAX(draw) OVER (PARTITION BY grp) AS mx FROM dd)
          |GROUP BY grp ORDER BY grp""".stripMargin),
      (s, dir) => {
        val d = Tables.events(s, dir)
          .select(col("event_type").as("grp"),
            expr("unix_micros(date_trunc('day', ts)) div 86400000000")
              .as("day"))
          .groupBy("grp", "day")
          .agg(count(lit(1)).as("n"))
        val wAll = Window.partitionBy("grp")
        val wCum = Window.partitionBy("grp").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val p = d
          .withColumn("nd", count(lit(1)).over(wAll))
          .withColumn("tot", sum("n").over(wAll))
          .withColumn("walk",
            sum(col("n") * col("nd") - col("tot")).over(wCum))
        val r = p.withColumn("peak", max("walk").over(wCum))
          .withColumn("draw", col("peak") - col("walk"))
        r.withColumn("mx", max("draw").over(wAll))
          .groupBy("grp")
          .agg(max("draw").cast("long").as("max_drawdown"),
            min(when(col("draw") === col("mx"), col("day"))).cast("long")
              .as("trough_day"),
            count(lit(1)).as("n_days"))
          .orderBy("grp")
      }),

    Q(
      "k_impute_group_median",
      """Constraint-based data repair — group-median imputation, the
        |cleaning step every feature pipeline runs before training:
        |negative account balances play the sentinel "missing" class
        |(the reference's own NaN/Inf sanitize, F19, handles the float
        |side; this is the semantic-missing side), and each missing
        |value is repaired with its NATION's lower-median of the valid
        |balances — percentile_disc semantics, deterministic (no
        |averaging, no float: the median is an actual observed cents
        |value picked by rank). Engine shape: valid balances rank
        |inside ONE nation-partitioned window over the customer frame,
        |the 25-row median dim broadcasts back, and the repair report
        |rolls up per nation: rows, repaired count, the median used,
        |and the exact post-repair sum — the invariant a repair audit
        |actually checks. Nations where EVERY value is missing keep
        |missing rows unrepaired (median NULL, sum excludes them) —
        |the honest convention, carried identically in both
        |engines.""".stripMargin,
      Some(
        """WITH c AS (
          |  SELECT c_custkey, c_nationkey AS nk,
          |         CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
          |  FROM customer),
          |v AS (
          |  SELECT nk, cents,
          |         ROW_NUMBER() OVER (PARTITION BY nk ORDER BY cents) AS rn,
          |         COUNT(*) OVER (PARTITION BY nk) AS m
          |  FROM c WHERE cents >= 0),
          |med AS (
          |  SELECT nk, CAST(cents AS BIGINT) AS median_cents
          |  FROM v WHERE rn = (m + 1) // 2),
          |rep AS (
          |  SELECT c.nk, c.cents, med.median_cents,
          |         CASE WHEN c.cents < 0 THEN med.median_cents
          |              ELSE c.cents END AS repaired
          |  FROM c LEFT JOIN med ON med.nk = c.nk)
          |SELECT CAST(nk AS BIGINT) AS nk,
          |       CAST(COUNT(*) AS BIGINT) AS n_rows,
          |       CAST(SUM(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_missing,
          |       CAST(MAX(median_cents) AS BIGINT) AS median_cents,
          |       CAST(SUM(repaired) AS BIGINT) AS sum_after_cents
          |FROM rep GROUP BY nk ORDER BY nk""".stripMargin),
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey").as("nk"),
            floor(col("c_acctbal") * 100).cast("long").as("cents"))
        val v = c.filter(col("cents") >= 0)
          .withColumn("rn", row_number().over(
            Window.partitionBy("nk").orderBy("cents")))
          .withColumn("m", count(lit(1)).over(Window.partitionBy("nk")))
        val med = v.filter(col("rn") === expr("(m + 1) div 2"))
          .select(col("nk"), col("cents").as("median_cents"))
        val rep = c.join(broadcast(med), Seq("nk"), "left")
          .withColumn("repaired",
            when(col("cents") < 0, col("median_cents")).otherwise(col("cents")))
        rep.groupBy("nk")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("cents") < 0, 1L).otherwise(0L)).as("n_missing"),
            max("median_cents").as("median_cents"),
            sum("repaired").cast("long").as("sum_after_cents"))
          .select(col("nk").cast("long").as("nk"), col("n_rows"),
            col("n_missing"), col("median_cents"), col("sum_after_cents"))
          .orderBy("nk")
      }),

    Q(
      "a_shapley_channels",
      """EXACT Shapley-value channel attribution — the game-theoretic
        |answer to "which touchpoint actually drives conversion" that
        |linear/time-decay splits (j_multitouch_attribution) only
        |approximate: a coalition is a (user, day) JOURNEY (the daily
        |scope is what makes the lattice non-degenerate — over the full
        |corpus every user eventually sees every channel and the value
        |function collapses to one point), v(S) is the observed
        |same-day conversion rate of journeys whose channel set is
        |EXACTLY S (unobserved coalitions contribute v=0 — the
        |convention rides in the doc and the hash), and each channel's
        |Shapley value is the factorial-weighted marginal sum over the
        |16-subset lattice. Everything is exact: rates in ppm,
        |factorial weights x24 (|S|!(3-|S|)! over 4 channels = 6/2/2/6
        |— the channel count is raise_error-guarded, weights are wrong
        |for any other n), phi reported in 24ths-of-ppm so no division
        |ever runs. The output carries a TOTAL row = 24(v(full) -
        |v(empty)) — the EFFICIENCY axiom; the per-channel rows must
        |sum to it (a telescoping identity of the formula), so the
        |hash pins the axiom itself. Engine shape: two key-cardinality
        |shuffles (user bitmask build, mask rollup), then the whole
        |lattice walk runs on a 16-row frame with a broadcast 4-row
        |channel dim — corpus size never touches the Shapley stage.
        |Bit order is the alphabetical channel rank — closed-form in
        |both engines, no hardcoded type list.""".stripMargin,
      Some(
        """WITH nch AS (
          |  SELECT COUNT(*) AS n
          |  FROM (SELECT DISTINCT event_type FROM events
          |        WHERE event_type <> 'purchase')),
          |bits AS (
          |  -- the 6/2/2/6 weights below are n=4 factorials; mirror the
          |  -- Spark side's raise_error so a channel-domain drift fails
          |  -- BOTH engines loudly instead of the ELSE 8 branch silently
          |  -- colliding masks into plausible garbage
          |  SELECT t AS channel, b,
          |         CASE WHEN nch.n <> 4 THEN error(
          |                'a_shapley_channels needs exactly 4 channels, saw '
          |                || nch.n)
          |              ELSE CASE b WHEN 0 THEN 1 WHEN 1 THEN 2
          |                          WHEN 2 THEN 4 ELSE 8 END
          |         END AS bitval
          |  FROM (SELECT t, ROW_NUMBER() OVER (ORDER BY t) - 1 AS b
          |        FROM (SELECT DISTINCT event_type AS t FROM events
          |              WHERE event_type <> 'purchase'))
          |  CROSS JOIN nch),
          |ub AS (
          |  SELECT DISTINCT e.user_id,
          |         epoch_us(date_trunc('day', e.ts)) // 86400000000 AS d,
          |         b.bitval
          |  FROM events e JOIN bits b ON e.event_type = b.channel),
          |um AS (SELECT user_id, d, CAST(SUM(bitval) AS BIGINT) AS mask
          |       FROM ub GROUP BY 1, 2),
          |uu AS (SELECT user_id,
          |              epoch_us(date_trunc('day', ts)) // 86400000000 AS d,
          |              CAST(MAX(CASE WHEN event_type = 'purchase'
          |                            THEN 1 ELSE 0 END) AS BIGINT) AS conv
          |       FROM events GROUP BY 1, 2),
          |mf AS (
          |  SELECT COALESCE(um.mask, 0) AS mask,
          |         CAST(COUNT(*) AS BIGINT) AS n,
          |         CAST(SUM(uu.conv) AS BIGINT) AS c
          |  FROM uu LEFT JOIN um ON um.user_id = uu.user_id AND um.d = uu.d
          |  GROUP BY 1),
          |lat AS (
          |  SELECT t.mask,
          |         COALESCE(CAST(mf.c * 1000000 // mf.n AS BIGINT), 0)
          |           AS v_ppm
          |  FROM range(0, 16) t(mask) LEFT JOIN mf ON mf.mask = t.mask),
          |pairs AS (
          |  SELECT ch.channel, s.mask, s.v_ppm, ch.bitval,
          |         (s.mask % 2) + (s.mask // 2 % 2) + (s.mask // 4 % 2)
          |           + (s.mask // 8 % 2) AS sz
          |  FROM lat s CROSS JOIN bits ch
          |  WHERE (s.mask & ch.bitval) = 0),
          |contrib AS (
          |  SELECT p.channel,
          |         CAST(CASE p.sz WHEN 0 THEN 6 WHEN 1 THEN 2
          |                        WHEN 2 THEN 2 ELSE 6 END
          |              * (w.v_ppm - p.v_ppm) AS BIGINT) AS dphi
          |  FROM pairs p JOIN lat w ON w.mask = p.mask + p.bitval)
          |SELECT channel, CAST(SUM(dphi) AS BIGINT) AS phi24_ppm
          |FROM contrib GROUP BY channel
          |UNION ALL
          |SELECT 'TOTAL', CAST(24 * (f.v_ppm - z.v_ppm) AS BIGINT)
          |FROM lat f, lat z WHERE f.mask = 15 AND z.mask = 0
          |ORDER BY channel""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val raw = ev.filter(col("event_type") =!= "purchase")
          .select(col("event_type").as("channel")).distinct()
          .withColumn("b",
            row_number().over(Window.orderBy("channel")) - 1)
        // the 6/2/2/6 weights below are n=4 factorials — refuse loudly
        // if the channel domain ever drifts
        val bits = raw
          .crossJoin(broadcast(raw.agg(count(lit(1)).as("nch"))))
          .select(col("channel"),
            when(col("nch") === 4, expr(
              "CASE b WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END"))
              .otherwise(raise_error(concat(
                lit("a_shapley_channels needs exactly 4 channels, saw "),
                col("nch")))).cast("long").as("bitval"))
        val dayCol = expr("unix_micros(date_trunc('day', ts)) div 86400000000")
        val ub = ev.join(broadcast(bits), ev("event_type") === bits("channel"))
          .select(col("user_id"), dayCol.as("d"), col("bitval")).distinct()
        val um = ub.groupBy("user_id", "d").agg(sum("bitval").as("mask"))
        val uu = ev.select(col("user_id"), dayCol.as("d"), col("event_type"))
          .groupBy("user_id", "d")
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        val mf = uu.join(um, Seq("user_id", "d"), "left")
          .groupBy(coalesce(col("mask"), lit(0L)).as("mask"))
          .agg(count(lit(1)).as("n"), sum("conv").as("c"))
        val lat = s.range(16).select(col("id").as("mask"))
          .join(broadcast(mf), Seq("mask"), "left")
          .select(col("mask"),
            coalesce(expr("cast(c * 1000000 div n as bigint)"), lit(0L))
              .as("v_ppm"))
          .cutLineage() // 16 rows; referenced three times below
        val pairs = lat.crossJoin(broadcast(bits))
          .filter(expr("(mask & bitval) = 0"))
          .withColumn("sz", expr(
            "(mask % 2) + (mask div 2 % 2) + (mask div 4 % 2) + (mask div 8 % 2)"))
        val contrib = pairs
          .join(broadcast(lat.select(col("mask").as("mask_w"),
            col("v_ppm").as("v_w"))),
            col("mask_w") === col("mask") + col("bitval"))
          .select(col("channel"),
            (expr("CASE sz WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END")
              * (col("v_w") - col("v_ppm"))).as("dphi"))
        val phi = contrib.groupBy("channel")
          .agg(sum("dphi").cast("long").as("phi24_ppm"))
        val total = lat.filter(col("mask") === 15)
          .select(col("v_ppm").as("vf"))
          .crossJoin(broadcast(lat.filter(col("mask") === 0)
            .select(col("v_ppm").as("vz"))))
          .select(lit("TOTAL").as("channel"),
            (lit(24L) * (col("vf") - col("vz"))).cast("long").as("phi24_ppm"))
        phi.unionAll(total).orderBy("channel")
      })
  )
}
