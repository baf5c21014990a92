package graft.queries

import graft.ops.Lineage._
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse data-operations queries: multi-dimensional clustering and
  * referential-integrity auditing — the maintenance surface around the
  * operators (ClusteredWriteSpec proves 1-D clustering on real parquet
  * footers; `k_zorder_cluster` is its 2-D companion; `audit_referential`
  * is the nightly constraint sweep a lake without enforced foreign keys
  * runs).
  */
object DataOpsQueries {

  /** The lazy DPP join for `j_dynamic_partition_prune` (factored out so
    * PlanShapeSpec can pin the dynamicpruning partition filter on the live
    * scan before the temp table is cleaned up): round-trip events through a
    * REAL day-partitioned parquet write under `tmp`, then join against the
    * aggregate-derived above-average-signup-days dimension. */
  private[queries] def buildDppJoin(s: org.apache.spark.sql.SparkSession,
                                    dir: String, tmp: java.io.File): org.apache.spark.sql.DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("day_id", expr("unix_timestamp(date_trunc('DAY', ts)) div 86400"))
      .select("event_type", "value", "day_id")
    val factPath = new java.io.File(tmp, "fact").getAbsolutePath
    ev.write.partitionBy("day_id").mode("overwrite").parquet(factPath)
    val fact = s.read.parquet(factPath)
    // above-average signup days: an aggregate-derived dim — static
    // constraint inference cannot reach it, so pruning MUST be dynamic
    val sd = ev.filter(col("event_type") === "signup")
      .groupBy("day_id").agg(count(lit(1)).as("n"))
    val tw = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dim = sd
      .withColumn("t", sum("n").over(tw))
      .withColumn("k", count(lit(1)).over(tw))
      .filter(col("n") * col("k") > col("t"))
      .select(col("day_id").cast("int").as("dim_day"))
    fact.join(broadcast(dim), fact("day_id") === col("dim_day"))
      .groupBy("event_type")
      .agg(
        countDistinct(fact("day_id")).as("n_days"),
        count(lit(1)).as("n_rows"),
        sum(floor(col("value") * 1000000L).cast("long")).as("v_sum_micro"))
      .orderBy("event_type")
  }

  /** Bit-interleave (Morton/Z-order) of two 10-bit values as a SQL
    * expression string; `divOp` is the engine's integer-division operator
    * ("div" for Spark, "//" for DuckDB) — both truncate toward zero, and
    * all operands here are non-negative, so the arithmetic is identical.
    * Powers of two as multipliers keep it shift-free and portable. */
  private def mortonSql(divOp: String, x: String, y: String): String =
    (0 until 10).flatMap { i =>
      Seq(
        s"(($x $divOp ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($y $divOp ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")

  /** Benford first-digit expectations log10(1 + 1/d) in exact ppm
    * (literals, so no libm log runs in either engine; they sum to
    * exactly 10^6). */
  private val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  val qs: Seq[Q] = Seq(
    Q(
      "audit_benford_digits",
      """Benford's-law first-digit audit — the forensic-accounting sweep
        |over a monetary column: the leading digit of every order total
        |(exact cents, extracted lexically so no float log runs) is
        |tallied against the Benford expectation log10(1+1/d), carried
        |as exact ppm LITERALS that sum to 10^6. Per digit: observed
        |count, observed ppm (floor), expected ppm, absolute deviation,
        |and the chi-square term in exact micro-units ((O-E)^2/E with
        |O,E in 10^-6 counts — squares widened through DECIMAL(38,0)/
        |HUGEINT since they pass 2^63 at the replica scale), plus the
        |whole-frame chi-square total every row carries (window over the
        |9-row digit frame). Synthetic prices are NOT Benford-shaped —
        |exactly what the audit exists to flag; the evidence is the
        |deviation report itself. Scale shape: one scan-side digit
        |extraction, one 9-key aggregate with map-side partials, then
        |arithmetic over a 9-row frame.""".stripMargin,
      Some {
        val values = BenfordPpm.map { case (d, p) => s"($d, ${p})" }.mkString(", ")
        s"""WITH v AS (
           |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           |  FROM orders WHERE o_totalprice > 0),
           |dg AS (
           |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
           |  FROM v),
           |e(digit, exp_ppm) AS (VALUES $values),
           |o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM dg GROUP BY 1),
           |j AS (
           |  -- cents >= 1 always leads with 1..9, so the digit frame's own
           |  -- window sum IS the total count: one scan serves O and N both
           |  SELECT e.digit, COALESCE(o.n_obs, 0) AS n_obs,
           |         CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
           |         CAST(SUM(COALESCE(o.n_obs, 0)) OVER () AS BIGINT) AS n_total
           |  FROM e LEFT JOIN o ON e.digit = o.digit),
           |r AS (
           |  SELECT digit, n_obs,
           |         CAST(n_obs * 1000000 // n_total AS BIGINT) AS obs_ppm,
           |         exp_ppm,
           |         CAST((CAST(n_obs AS HUGEINT) * 1000000
           |                 - CAST(exp_ppm AS HUGEINT) * n_total)
           |              * (CAST(n_obs AS HUGEINT) * 1000000
           |                 - CAST(exp_ppm AS HUGEINT) * n_total)
           |              // (CAST(exp_ppm AS HUGEINT) * n_total) AS BIGINT) AS chi2_micro
           |  FROM j)
           |SELECT digit, n_obs, obs_ppm, exp_ppm,
           |       ABS(obs_ppm - exp_ppm) AS dev_ppm,
           |       chi2_micro,
           |       CAST(SUM(chi2_micro) OVER () AS BIGINT) AS chi2_total_micro
           |FROM r
           |ORDER BY digit""".stripMargin
      },
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val digits = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 0)
          .select(substring(floor(col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
            .cast("long").as("digit"))
        val obs = digits.groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val e = s.createDataFrame(BenfordPpm).toDF("digit", "exp_ppm")
          .select(col("digit").cast("long").as("digit"), col("exp_ppm"))
        val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val r = e
          .join(obs, Seq("digit"), "left")
          .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
          // cents >= 1 always leads with 1..9: the 9-row frame's own window
          // sum IS the total count — one scan serves O and N both
          .withColumn("n_total", sum("n_obs").over(wAll).cast("long"))
          .withColumn("obs_ppm", expr("(n_obs * 1000000) div n_total"))
          .withColumn("omicro", expr("cast(n_obs as decimal(19,0)) * 1000000"))
          .withColumn("emicro", expr("cast(exp_ppm as decimal(19,0)) * n_total"))
          .withColumn("chi2_micro",
            expr("cast(((omicro - emicro) * (omicro - emicro)) div emicro as bigint)"))
        r.select(
          col("digit"), col("n_obs"), col("obs_ppm"), col("exp_ppm"),
          abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"),
          col("chi2_micro"),
          sum("chi2_micro").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .cast("long").as("chi2_total_micro"))
          .orderBy("digit")
      }),

    Q(
      "k_ivm_aggregate",
      """Incremental view maintenance with retractions — the delta-merge
        |behind every materialized-view engine: a COUNT/SUM-per-key view
        |is built over the base (orders with orderkey%10 != 0), then a
        |CDC-shaped delta batch arrives in ONE scan (%10==0 inserts,
        |%10==5 price revisions emitted as -old/+new retraction pairs,
        |%10==7 deletes) with signed multiplicities; maintenance is
        |delta-aggregate -> full-outer merge -> coalesced sums, keys
        |whose support reaches zero vanish, and negative support raises
        |(a retraction without its base row is corruption, not data).
        |The DuckDB oracle REBUILDS the view from scratch on the
        |post-delta state, so the hash match IS the maintenance-
        |correctness proof. Scale shape: the delta aggregate shuffles
        |delta-sized data; the merge joins on the view key (bucketed
        |view -> co-located, and here the groupBy's partitioning is
        |reused — no extra exchange); money in exact integer cents.""".stripMargin,
      Some(
        """WITH o AS (
          |  SELECT o_orderkey, o_custkey,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
          |  FROM orders),
          |cur AS (
          |  SELECT o_custkey,
          |         CASE WHEN o_orderkey % 10 = 5
          |              THEN cents + cents // 10 ELSE cents END AS cents
          |  FROM o
          |  WHERE o_orderkey % 10 <> 7)
          |SELECT o_custkey AS custkey,
          |       CAST(COUNT(*) AS BIGINT) AS n_orders,
          |       CAST(SUM(cents) AS BIGINT) AS total_cents
          |FROM cur
          |GROUP BY 1
          |ORDER BY custkey""".stripMargin),
      (s, dir) => {
        val ord = Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_custkey").as("custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        val view0 = ord.filter(expr("o_orderkey % 10 <> 0"))
          .groupBy("custkey")
          .agg(count(lit(1)).as("n0"), sum("cents").as("c0"))
        // the CDC feed: one scan, signed (multiplicity, cents) rows
        val delta = ord.filter(expr("o_orderkey % 10 IN (0, 5, 7)"))
          .select(col("custkey"), explode(expr(
            """CASE WHEN o_orderkey % 10 = 0
              |     THEN array(named_struct('m', 1L, 'c', cents))
              |     WHEN o_orderkey % 10 = 5
              |     THEN array(named_struct('m', -1L, 'c', cents),
              |                named_struct('m', 1L, 'c', cents + cents div 10))
              |     ELSE array(named_struct('m', -1L, 'c', cents))
              |END""".stripMargin)).as("mc"))
          .select(col("custkey"), col("mc.m").as("m"), col("mc.c").as("c"))
        val dAgg = delta.groupBy("custkey")
          .agg(sum("m").as("dn"), sum(col("m") * col("c")).as("dc"))
        view0.join(dAgg, Seq("custkey"), "full_outer")
          .select(
            col("custkey"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
            (coalesce(col("c0"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("total_cents"))
          .withColumn("n_orders",
            when(col("n_orders") >= 0, col("n_orders"))
              .otherwise(raise_error(concat(
                lit("IVM negative support for custkey "), col("custkey")))))
          .filter(col("n_orders") > 0)
          .orderBy("custkey")
      }),

    Q(
      "k_zorder_cluster",
      """Z-order (Morton) clustering over two dimensions — the
        |multi-dimensional data-skipping layout: interleave the low 10
        |bits of part key and supplier key into a 20-bit curve position,
        |bucket the curve into 16 ranges, and report each bucket's row
        |count and per-dimension min/max spans. The point the output
        |makes inspectable: every bucket covers a NARROW range of BOTH
        |dimensions simultaneously (spans ~1/4 of each axis, vs 1/16 of
        |one axis and ALL of the other under single-column sorting) — the
        |property that lets a scan skip row groups on either predicate.
        |The curve position is pure integer arithmetic (div/mod by powers
        |of two), bit-identical on both engines. Scan-side compute + one
        |16-key aggregate.""".stripMargin,
      Some {
        val m = mortonSql("//", "px", "sy")
        s"""WITH b AS (
           |  SELECT l_partkey % 1024 AS px, l_suppkey % 1024 AS sy
           |  FROM lineitem),
           |z AS (SELECT px, sy, ($m) // 65536 AS zbucket FROM b)
           |SELECT zbucket,
           |       COUNT(*) AS n_rows,
           |       MIN(px) AS px_min, MAX(px) AS px_max,
           |       MIN(sy) AS sy_min, MAX(sy) AS sy_max,
           |       MAX(px) - MIN(px) AS px_span,
           |       MAX(sy) - MIN(sy) AS sy_span
           |FROM z
           |GROUP BY zbucket
           |ORDER BY zbucket""".stripMargin
      },
      (s, dir) => {
        // native codegen'd interleave (graft.plans.MortonInterleaveExpression,
        // five shift-mask steps); the declarative mortonSql stays as the
        // oracle twin and MortonSpec pins their bit equivalence
        Tables.lineitem(s, dir)
          .select(
            pmod(col("l_partkey"), lit(1024)).as("px"),
            pmod(col("l_suppkey"), lit(1024)).as("sy"))
          .withColumn("zbucket",
            expr("graft_morton(px, sy) div 65536"))
          .groupBy("zbucket")
          .agg(
            count(lit(1)).as("n_rows"),
            min(col("px")).as("px_min"), max(col("px")).as("px_max"),
            min(col("sy")).as("sy_min"), max(col("sy")).as("sy_max"),
            (max(col("px")) - min(col("px"))).as("px_span"),
            (max(col("sy")) - min(col("sy"))).as("sy_span"))
          .orderBy("zbucket")
      }),

    Q(
      "audit_referential",
      """Referential-integrity audit — the nightly constraint sweep over a
        |lake with no enforced foreign keys: for each declared reference
        |(lineitem→orders, lineitem→part, lineitem→supplier,
        |orders→customer, events.user_id→customer), count the rows whose
        |key has no match. Each check is a broadcast anti-join probing the
        |dimension's distinct keys, so the fact tables never shuffle; the
        |five one-row summaries union into one report. The TPC-H-shaped
        |references audit clean by construction; the events check carries
        |real orphans (user ids outside the customer key space), so the
        |query provably distinguishes the two outcomes.""".stripMargin,
      Some(
        """SELECT * FROM (
          |  SELECT 'lineitem.orderkey->orders' AS check_name,
          |         COUNT(*) AS n_rows,
          |         COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS n_orphans
          |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  UNION ALL
          |  SELECT 'lineitem.partkey->part',
          |         COUNT(*), COUNT(CASE WHEN p.p_partkey IS NULL THEN 1 END)
          |  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
          |  UNION ALL
          |  SELECT 'lineitem.suppkey->supplier',
          |         COUNT(*), COUNT(CASE WHEN s.s_suppkey IS NULL THEN 1 END)
          |  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |  UNION ALL
          |  SELECT 'orders.custkey->customer',
          |         COUNT(*), COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END)
          |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          |  UNION ALL
          |  SELECT 'events.user_id->customer',
          |         COUNT(*), COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END)
          |  FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey)
          |ORDER BY check_name""".stripMargin),
      (s, dir) => {
        def check(name: String, fact: org.apache.spark.sql.DataFrame,
                  factKey: String, dim: org.apache.spark.sql.DataFrame,
                  dimKey: String) =
          fact.select(col(factKey).as("k"))
            .join(broadcast(dim.select(col(dimKey).as("dk")).distinct()),
              col("k") === col("dk"), "left")
            .agg(
              count(lit(1)).as("n_rows"),
              count(when(col("dk").isNull, 1)).as("n_orphans"))
            .select(lit(name).as("check_name"), col("n_rows"), col("n_orphans"))
        val li = Tables.lineitem(s, dir)
        check("lineitem.orderkey->orders", li, "l_orderkey",
            Tables.orders(s, dir), "o_orderkey")
          .unionAll(check("lineitem.partkey->part", li, "l_partkey",
            Tables.part(s, dir), "p_partkey"))
          .unionAll(check("lineitem.suppkey->supplier", li, "l_suppkey",
            Tables.supplier(s, dir), "s_suppkey"))
          .unionAll(check("orders.custkey->customer", Tables.orders(s, dir),
            "o_custkey", Tables.customer(s, dir), "c_custkey"))
          .unionAll(check("events.user_id->customer", Tables.events(s, dir),
            "user_id", Tables.customer(s, dir), "c_custkey"))
          .orderBy("check_name")
      }),

    Q(
      "audit_zone_map_pruning",
      """Zone-map (data-skipping) statistics audit — the min/max-per-file
        |metadata that lets a 100 TB scan skip row groups wholesale
        |(parquet column statistics, Delta/Iceberg file stats, the
        |mechanism behind PushedFilters actually paying off): per
        |(event_type, day) zone, row count and the value column's
        |min/max in exact floor-micro units, plus the pruning verdict a
        |`value >= 250` high-value scan would reach (scan the zone iff
        |zone_max >= the predicate bound) and the resulting global scan
        |fraction in ppm — the number a table-layout tuner watches when
        |deciding whether clustering by value would pay. ONE
        |zone-keyed aggregate over the scan; the ppm rollup is a global
        |window over the collapsed (types × days) zone frame.""".stripMargin,
      Some(
        """WITH z AS (
          |  SELECT event_type,
          |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
          |           AS day_id,
          |         CAST(COUNT(*) AS BIGINT) AS n_rows,
          |         CAST(MIN(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |           AS vmin_micro,
          |         CAST(MAX(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |           AS vmax_micro
          |  FROM events GROUP BY 1, 2),
          |f AS (SELECT *, vmax_micro >= 250000000 AS would_scan FROM z)
          |SELECT event_type, day_id, n_rows, vmin_micro, vmax_micro, would_scan,
          |       CAST(SUM(CASE WHEN would_scan THEN n_rows ELSE 0 END) OVER ()
          |            AS BIGINT) * 1000000
          |         // CAST(SUM(n_rows) OVER () AS BIGINT) AS scan_ppm
          |FROM f
          |ORDER BY event_type, day_id""".stripMargin),
      (s, dir) => {
        val tw = Window
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_timestamp(date_trunc('DAY', ts)) div 86400").as("day_id"))
          .agg(count(lit(1)).as("n_rows"),
            min(floor(col("value") * 1000000L).cast("long")).as("vmin_micro"),
            max(floor(col("value") * 1000000L).cast("long")).as("vmax_micro"))
          .withColumn("would_scan", col("vmax_micro") >= 250000000L)
          .withColumn("scanned",
            sum(when(col("would_scan"), col("n_rows")).otherwise(lit(0L))).over(tw))
          .withColumn("total", sum(col("n_rows")).over(tw))
          .select(col("event_type"), col("day_id"), col("n_rows"),
            col("vmin_micro"), col("vmax_micro"), col("would_scan"),
            expr("scanned * 1000000 div total").as("scan_ppm"))
          .orderBy("event_type", "day_id")
      }),

    Q(
      "j_dynamic_partition_prune",
      """Dynamic partition pruning — the runtime-filter mechanism a 100 TB
        |date-partitioned lake lives on: the fact table is round-tripped
        |through a REAL day-partitioned parquet write, the qualifying-day
        |dimension is an AGGREGATE (above-average signup days — a set no
        |static rule can infer, so the pruning genuinely happens at
        |runtime), and the join compiles to a scan whose PartitionFilters
        |carry a dynamicpruning subquery: only qualifying day directories
        |are listed and read. PlanShapeSpec pins the dynamicpruning
        |expression on the scan. The oracle computes the same join on the
        |original table — equality proves the partitioned round-trip AND
        |the pruned scan lose nothing. At scale this is the difference
        |between reading 3 days and reading 10 years.""".stripMargin,
      Some(
        """WITH ev AS (
          |  SELECT event_type, value,
          |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS day_id
          |  FROM events),
          |sd AS (
          |  SELECT day_id, CAST(COUNT(*) AS BIGINT) AS n
          |  FROM ev WHERE event_type = 'signup' GROUP BY 1),
          |tot AS (
          |  SELECT CAST(SUM(n) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS k FROM sd),
          |dim AS (
          |  SELECT day_id FROM sd, tot WHERE n * k > t)
          |SELECT f.event_type,
          |       COUNT(DISTINCT f.day_id) AS n_days,
          |       COUNT(*) AS n_rows,
          |       CAST(SUM(CAST(floor(f.value * 1000000) AS BIGINT)) AS BIGINT) AS v_sum_micro
          |FROM ev f JOIN dim ON f.day_id = dim.day_id
          |GROUP BY f.event_type
          |ORDER BY f.event_type""".stripMargin),
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-dpp").toFile
        try {
          val res = buildDppJoin(s, dir, tmp)
          // materialize the event_type-sized rollup (bounded, <=5 rows)
          // BEFORE the temp table is deleted — the returned frame must not
          // re-scan files the finally block removes
          val out = s.createDataFrame(
            new java.util.ArrayList(java.util.Arrays.asList(res.collect(): _*)),
            res.schema)
          out.orderBy("event_type")
        } finally {
          org.apache.commons.io.FileUtils.deleteQuietly(tmp); ()
        }
      }),

    Q(
      "audit_range_checksums",
      """Anti-entropy range checksums — the replica-divergence /
        |migration-audit primitive (Cassandra repair, Delta table-clone
        |verification): fingerprint each key range of the table so two
        |copies can be diffed by exchanging range-cardinality summaries
        |instead of rows. Rows hash on their INTEGER/STRING canonical
        |fields (md5-prefix 48-bit; doubles are excluded from the hash
        |input because engines render them differently — the quantity
        |participates as floor-micro bigint); each 1024-order range emits
        |row count, an ORDER-INDEPENDENT checksum (sum of row hashes mod
        |2^48 — commutative, so partitioning and merge order cannot
        |change it; the mod rides DECIMAL/HUGEINT so the pre-mod sum
        |never overflows), and the range's key span. Pure scan-side
        |hashing + one range-keyed aggregate.""".stripMargin,
      Some {
        val h = """CAST(list_sum(list_transform(range(1, 13),
                  |  i -> (strpos('0123456789abcdef',
                  |          substr(md5(l_orderkey || '|' || l_linenumber || '|' ||
                  |                     l_partkey || '|' || l_suppkey || '|' ||
                  |                     l_returnflag || '|' || l_linestatus || '|' ||
                  |                     CAST(CAST(floor(l_quantity * 1000000) AS BIGINT) AS VARCHAR)),
                  |                 CAST(i AS INTEGER), 1)) - 1)
                  |       * power(16, 12 - i))) AS BIGINT)""".stripMargin
        s"""WITH h AS (
           |  SELECT l_orderkey // 1024 AS rng, l_orderkey,
           |         $h AS rh
           |  FROM lineitem)
           |SELECT rng,
           |       CAST(COUNT(*) AS BIGINT) AS n_rows,
           |       CAST(SUM(CAST(rh AS HUGEINT)) % 281474976710656 AS BIGINT) AS checksum,
           |       MIN(l_orderkey) AS key_min, MAX(l_orderkey) AS key_max
           |FROM h GROUP BY rng
           |ORDER BY rng""".stripMargin
      },
      (s, dir) => {
        val canon = "concat(l_orderkey, '|', l_linenumber, '|', l_partkey, '|', " +
          "l_suppkey, '|', l_returnflag, '|', l_linestatus, '|', " +
          "cast(cast(floor(l_quantity * 1000000) as bigint) as string))"
        Tables.lineitem(s, dir)
          .select(expr("l_orderkey div 1024").as("rng"), col("l_orderkey"),
            expr(s"cast(conv(substring(md5($canon), 1, 12), 16, 10) as bigint)")
              .as("rh"))
          .groupBy("rng")
          .agg(
            count(lit(1)).as("n_rows"),
            pmod(sum(col("rh").cast("decimal(38,0)")), lit(281474976710656L))
              .cast("long").as("checksum"),
            min(col("l_orderkey")).as("key_min"),
            max(col("l_orderkey")).as("key_max"))
          .orderBy("rng")
      }),

    Q(
      "audit_skew_profile",
      """Join-key skew profile — the pre-flight check that decides when a
        |key needs salting (skew_salted_agg) or an AQE skew split
        |(SkewJoinSpec) BEFORE a job hits the hot-partition wall: for
        |each declared join key, total rows, distinct keys, the hottest
        |key's count, and the skew ratio in ppm of a perfectly uniform
        |distribution (max_cnt * n_keys * 10^6 div n_rows; 10^6 =
        |uniform). Each profile is a per-key aggregate (map-side
        |combinable, key-cardinality-sized) collapsed to one summary row;
        |the three profiles union into the report. All integer — no
        |float ties.""".stripMargin,
      Some {
        def prof(name: String, key: String, table: String) =
          s"""SELECT '$name' AS key_name,
             |       CAST(SUM(c) AS BIGINT) AS n_rows,
             |       CAST(COUNT(*) AS BIGINT) AS n_keys,
             |       CAST(MAX(c) AS BIGINT) AS max_cnt
             |FROM (SELECT $key, COUNT(*) AS c FROM $table GROUP BY $key)"""
            .stripMargin
        s"""WITH p AS (
           |  ${prof("events.user_id", "user_id", "events")}
           |  UNION ALL ${prof("lineitem.l_partkey", "l_partkey", "lineitem")}
           |  UNION ALL ${prof("lineitem.l_suppkey", "l_suppkey", "lineitem")})
           |SELECT key_name, n_rows, n_keys, max_cnt,
           |       max_cnt * n_keys * 1000000 // n_rows AS skew_ppm
           |FROM p ORDER BY key_name""".stripMargin
      },
      (s, dir) => {
        def prof(name: String, df: org.apache.spark.sql.DataFrame, key: String) =
          df.groupBy(col(key)).agg(count(lit(1)).as("c"))
            .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
              max(col("c")).as("max_cnt"))
            .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"),
              col("max_cnt"))
        prof("events.user_id", Tables.events(s, dir), "user_id")
          .unionAll(prof("lineitem.l_partkey", Tables.lineitem(s, dir), "l_partkey"))
          .unionAll(prof("lineitem.l_suppkey", Tables.lineitem(s, dir), "l_suppkey"))
          .withColumn("skew_ppm", expr("max_cnt * n_keys * 1000000 div n_rows"))
          .orderBy("key_name")
      }),

    Q(
      "audit_late_arrivals",
      """Out-of-order ingestion audit — the pre-flight check that sizes
        |streaming watermarks and backfill windows: within each
        |(type, day), order events by event time and flag every row
        |whose ingestion id is below the running max of PRECEDING rows —
        |meaning some earlier-event-time record was ingested after it
        |(arrived late). Inversions are measured within the day
        |partition deliberately: the window key is (type, day), so
        |partitions stay day-sized at any corpus scale (cross-day
        |lateness shows up in the day it lands — the operationally
        |relevant bucket). One windowed scan + one aggregate on the same
        |key; disorder reported in integer ppm.""".stripMargin,
      Some(
        """WITH e AS (
          |  SELECT event_type, CAST(ts AS DATE) AS d, ts, event_id
          |  FROM events),
          |w AS (
          |  SELECT event_type, d, event_id,
          |         MAX(event_id) OVER (PARTITION BY event_type, d
          |                             ORDER BY ts, event_id
          |                             ROWS BETWEEN UNBOUNDED PRECEDING
          |                                      AND 1 PRECEDING) AS runmax
          |  FROM e)
          |SELECT event_type, d,
          |       CAST(COUNT(*) AS BIGINT) AS n,
          |       CAST(COUNT(*) FILTER (WHERE event_id < runmax) AS BIGINT)
          |         AS n_late,
          |       CAST(COUNT(*) FILTER (WHERE event_id < runmax) * 1000000
          |            // COUNT(*) AS BIGINT) AS late_ppm
          |FROM w
          |GROUP BY 1, 2
          |ORDER BY event_type, d""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("event_type", "d").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .select(col("event_type"), to_date(col("ts")).as("d"),
            col("ts"), col("event_id"))
          .withColumn("runmax", max(col("event_id")).over(w))
          .groupBy("event_type", "d")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("event_id") < col("runmax"), 1L).otherwise(0L))
              .as("n_late"))
          .withColumn("late_ppm", expr("n_late * 1000000 div n"))
          .orderBy("event_type", "d")
      }),

    Q(
      "audit_gdpr_erasure",
      """Right-to-be-forgotten erasure audit — the compliance sweep a
        |lake runs after a deletion batch: for a deletion list (users
        |with id ≡ 0 mod 97, standing in for the DSAR queue), scrub
        |three user-keyed surfaces (the raw event log, the
        |session-store twin = distinct user-days, the dispatch twin =
        |purchase events) by BROADCAST anti-join — facts never shuffle
        |to be scrubbed — and emit per surface: rows before, rows
        |erased, rows after, and the RESIDUAL count of deletion-list
        |rows still present post-scrub (the audit's point; must be 0,
        |and the oracle hash makes any nonzero residual a red row).
        |before = erased + after is carried in the data as a second
        |auditable invariant.""".stripMargin,
      Some(
        """WITH del AS (
          |  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0),
          |ev AS (SELECT user_id FROM events),
          |sess AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
          |disp AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
          |audit AS (
          |  SELECT 'events' AS surface,
          |         (SELECT COUNT(*) FROM ev) AS n_before,
          |         (SELECT COUNT(*) FROM ev WHERE user_id IN (SELECT user_id FROM del))
          |           AS n_erased,
          |         (SELECT COUNT(*) FROM ev WHERE user_id NOT IN (SELECT user_id FROM del)
          |            AND user_id IN (SELECT user_id FROM del)) AS residual
          |  UNION ALL
          |  SELECT 'session_store',
          |         (SELECT COUNT(*) FROM sess),
          |         (SELECT COUNT(*) FROM sess WHERE user_id IN (SELECT user_id FROM del)),
          |         (SELECT COUNT(*) FROM sess WHERE user_id NOT IN (SELECT user_id FROM del)
          |            AND user_id IN (SELECT user_id FROM del))
          |  UNION ALL
          |  SELECT 'dispatches',
          |         (SELECT COUNT(*) FROM disp),
          |         (SELECT COUNT(*) FROM disp WHERE user_id IN (SELECT user_id FROM del)),
          |         (SELECT COUNT(*) FROM disp WHERE user_id NOT IN (SELECT user_id FROM del)
          |            AND user_id IN (SELECT user_id FROM del)))
          |SELECT surface, CAST(n_before AS BIGINT) AS n_before,
          |       CAST(n_erased AS BIGINT) AS n_erased,
          |       CAST(n_before - n_erased AS BIGINT) AS n_after,
          |       CAST(residual AS BIGINT) AS residual
          |FROM audit
          |ORDER BY surface""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val del = ev.filter(col("user_id") % 97 === 0)
          .select("user_id").distinct().cutLineage()
        def audit(surface: String, t: org.apache.spark.sql.DataFrame) = {
          val scrubbed = t.join(broadcast(del), Seq("user_id"), "left_anti")
            .cutLineage() // the erasure itself, materialized once
          val residual = scrubbed.join(broadcast(del), Seq("user_id"), "left_semi")
          t.agg(count(lit(1)).as("n_before"))
            .crossJoin(scrubbed.agg(count(lit(1)).as("n_after")))
            .crossJoin(residual.agg(count(lit(1)).as("residual")))
            .select(lit(surface).as("surface"), col("n_before"),
              (col("n_before") - col("n_after")).as("n_erased"),
              col("n_after"), col("residual"))
        }
        audit("events", ev.select("user_id"))
          .unionAll(audit("session_store",
            ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()))
          .unionAll(audit("dispatches",
            ev.filter(col("event_type") === "purchase").select("user_id")))
          .orderBy("surface")
      }),

    Q(
      "audit_fd_violations",
      """Functional-dependency discovery audit — the profiling sweep
        |(TANE/metanome family) that tells a lake which column pairs
        |ACTUALLY behave as keys/hierarchies: for each candidate FD
        |(brand→type, type→size, name→brand over part), every LHS
        |group elects its modal RHS (max count, lexicographic-min RHS
        |on ties — deterministic) and rows outside the modal class are
        |the violations. g3-style error metric in exact ppm. Engine
        |shape per FD: one (lhs, rhs) count aggregate — key-cardinality
        |shuffle — then a window over the (lhs, rhs) DISTINCT-pair
        |frame (value-domain bounded), then a frame-sized rollup; the
        |three FDs union into one 3-row report. No self-joins, no
        |row-level windows.""".stripMargin,
      Some(
        """WITH
          |f1 AS (SELECT CAST(p_brand AS VARCHAR) AS lhs,
          |              CAST(p_type AS VARCHAR) AS rhs FROM part),
          |f2 AS (SELECT CAST(p_type AS VARCHAR), CAST(p_size AS VARCHAR)
          |       FROM part),
          |f3 AS (SELECT CAST(p_name AS VARCHAR), CAST(p_brand AS VARCHAR)
          |       FROM part),
          |u AS (SELECT 'brand_to_type' AS fd, * FROM f1
          |      UNION ALL SELECT 'type_to_size', * FROM f2
          |      UNION ALL SELECT 'name_to_brand', * FROM f3),
          |g AS (SELECT fd, lhs, rhs, CAST(COUNT(*) AS BIGINT) AS c
          |      FROM u GROUP BY 1, 2, 3),
          |m AS (SELECT fd, lhs, c,
          |             SUM(c) OVER (PARTITION BY fd, lhs) AS tot,
          |             ROW_NUMBER() OVER (PARTITION BY fd, lhs
          |                                ORDER BY c DESC, rhs) AS rk
          |      FROM g)
          |SELECT fd,
          |       CAST(COUNT(*) AS BIGINT) AS n_lhs,
          |       CAST(SUM(CASE WHEN tot > c THEN 1 ELSE 0 END) AS BIGINT)
          |         AS violating_lhs,
          |       CAST(SUM(tot) AS BIGINT) AS rows_total,
          |       CAST(SUM(tot - c) AS BIGINT) AS viol_rows,
          |       CAST(SUM(tot - c) * 1000000 // SUM(tot) AS BIGINT)
          |         AS g3_err_ppm
          |FROM m WHERE rk = 1
          |GROUP BY fd ORDER BY fd""".stripMargin),
      (s, dir) => {
        val part = Tables.part(s, dir)
        def fd(name: String, lhs: String, rhs: String) =
          part.select(lit(name).as("fd"),
            col(lhs).cast("string").as("lhs"),
            col(rhs).cast("string").as("rhs"))
        val u = fd("brand_to_type", "p_brand", "p_type")
          .unionAll(fd("type_to_size", "p_type", "p_size"))
          .unionAll(fd("name_to_brand", "p_name", "p_brand"))
        val g = u.groupBy("fd", "lhs", "rhs").agg(count(lit(1)).as("c"))
        val m = g
          .withColumn("tot", sum("c").over(Window.partitionBy("fd", "lhs")))
          .withColumn("rk", row_number().over(
            Window.partitionBy("fd", "lhs").orderBy(col("c").desc, col("rhs"))))
          .filter(col("rk") === 1)
        m.groupBy("fd")
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("tot") > col("c"), 1L).otherwise(0L))
              .as("violating_lhs"),
            sum("tot").as("rows_total"),
            sum(col("tot") - col("c")).as("viol_rows"))
          .select(col("fd"), col("n_lhs"), col("violating_lhs"),
            col("rows_total"), col("viol_rows"),
            expr("viol_rows * 1000000 div rows_total").as("g3_err_ppm"))
          .orderBy("fd")
      }),

    Q(
      "k_compaction_bins",
      """Small-file compaction planning — the nightly lakehouse
        |maintenance pass that groups many small files into
        |target-sized rewrite jobs: the file manifest (one "file" per
        |ship-day here, sized at rows x 131 bytes — the closed-form
        |stand-in both engines derive identically) is walked in day
        |order and every file lands in bin floor(bytes-before / target)
        |— the prefix-sum formulation of greedy sequential packing, so
        |the whole plan is ONE cumulative window over the day-domain
        |frame (~2.4k rows at every corpus size; the manifest, not the
        |corpus, is windowed) and a bin-keyed rollup. Each bin overruns
        |its 4 MiB target by at most one file — the standard greedy
        |guarantee — and the report pins per-bin file counts, exact
        |byte totals, and the day span a rewrite job would touch.""".stripMargin,
      Some(
        """WITH f AS (
          |  SELECT epoch_us(date_trunc('day', l_shipdate)) // 86400000000
          |           AS d,
          |         CAST(COUNT(*) * 131 AS BIGINT) AS bytes
          |  FROM lineitem GROUP BY 1),
          |c AS (
          |  SELECT d, bytes,
          |         CAST(COALESCE(SUM(bytes) OVER (ORDER BY d
          |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          |              0) AS BIGINT) AS before
          |  FROM f)
          |SELECT CAST(before // 4194304 AS BIGINT) AS bin,
          |       CAST(COUNT(*) AS BIGINT) AS files,
          |       CAST(SUM(bytes) AS BIGINT) AS bytes,
          |       CAST(MIN(d) AS BIGINT) AS d_min,
          |       CAST(MAX(d) AS BIGINT) AS d_max
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val f = Tables.lineitem(s, dir)
          .select(expr(
            "unix_micros(date_trunc('day', l_shipdate)) div 86400000000")
            .as("d"))
          .groupBy("d")
          .agg((count(lit(1)) * 131L).as("bytes"))
        // global cumulative window, but over the COLLAPSED day manifest
        // (~2.4k rows at any SF) — the frame, not the corpus, is sorted
        val wBefore = Window.orderBy("d")
          .rowsBetween(Window.unboundedPreceding, -1)
        f.withColumn("before",
            coalesce(sum("bytes").over(wBefore), lit(0L)))
          .withColumn("bin", expr("before div 4194304"))
          .groupBy("bin")
          .agg(count(lit(1)).as("files"), sum("bytes").as("bytes"),
            min("d").as("d_min"), max("d").as("d_max"))
          .select(col("bin"), col("files"),
            col("bytes").cast("long").as("bytes"),
            col("d_min").cast("long").as("d_min"),
            col("d_max").cast("long").as("d_max"))
          .orderBy("bin")
      }))
}
