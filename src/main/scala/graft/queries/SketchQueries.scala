package graft.queries

import graft.ops.Lineage._
import graft.functions.Vectors
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Sketch-based approximation operators with EXACT deterministic oracles —
  * the dd_minhash_est pattern extended to the two classic distributed
  * sketches a 100 TB engine leans on:
  *
  *  - KMV (k-minimum-values) distinct-count estimation: the sketch is a
  *    bounded-heap aggregate (k smallest hash values per group), so the
  *    shuffle carries k values per group instead of every distinct key —
  *    the cardinality sketch that merges by min-union. The estimator
  *    (k-1)/frac(kth) is computed in exact integer arithmetic on the
  *    48-bit hash prefix, side by side with the exact distinct count, so
  *    the oracle proves BOTH the sketch mechanics and its calibration.
  *  - Bloom-filter pre-filtered semi-join: a 1008-bit two-hash Bloom
  *    bitset of a small key set (16 packed 63-bit BIGINT blocks) is built by
  *    aggregation, broadcast as ONE row, and probed row-locally by the
  *    fact scan BEFORE any shuffle — the membership pre-filter that cuts
  *    shuffle volume at scale (Spark's own runtime-filter idea, made
  *    explicit and oracle-checkable). False positives are then resolved
  *    by the exact semi-join, and the query reports both counts, so the
  *    hash compare pins the filter's exact selectivity.
  *
  * Hashing is md5-hex-prefix arithmetic (no strtol in DuckDB 1.0: the
  * oracle rebuilds the 48-bit integer from hex digits via strpos; Spark
  * uses conv()). All derived quantities are integers — no float ties.
  */
object SketchQueries {

  private val KmvK = 256
  /** (KmvK-1) * 2^48 — the estimator numerator, exact in BIGINT. */
  private val KmvNum = 255L * (1L << 48)

  /** HLL: alpha_64 (709/1000) * m^2 * 2^36 — numerator of the raw
    * estimator with every term scaled by 2^36 so the register sum stays
    * an exact BIGINT. 709*4096*2^36 ~ 2.0e17, comfortably in range. */
  private val HllNum = 709L * 4096L * (1L << 36)

  /** Adds the m=64 HLL register coordinates for `user_id`: `reg` (low 6
    * hash bits) and `rho` (trailing-zero count + 1 of the next 36 bits,
    * 36 when they are all zero). Row-local; shared by the per-type and
    * sliding-window sketch queries. */
  private def hllRho(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = ev
    .withColumn("h",
      expr("conv(substring(md5(cast(user_id as string)), 1, 12), 16, 10)")
        .cast("long"))
    .withColumn("reg", expr("h % 64"))
    .withColumn("w", expr(s"(h div 64) % ${1L << 36}"))
    .withColumn("rho",
      when(col("w") === 0, lit(36))
        .otherwise(length(bin(expr("w & -w"))).cast("int")))

  /** The matching DuckDB fragment: SELECT-list expressions deriving
    * (reg, w) from a hash column named `h`. */
  private val duckHllRegW =
    s"h % 64 AS reg, (h // 64) % ${1L << 36} AS w"
  private val duckHllRho =
    "CASE WHEN w = 0 THEN 36 ELSE length(bin(w & (-w))) END AS rho"
  /** DuckDB: registers -> scaled 2^-M sum term (empty registers are the
    * `(64 - COUNT(*)) * 2^36` completion at the agg site). */
  private val duckHllTerm = "1::BIGINT << CAST(36 - m_j AS INTEGER)"

  /** DuckDB: 48-bit integer from the first 12 hex chars of md5(expr). */
  private def duckHash48(expr: String): String =
    s"""CAST(list_sum(list_transform(range(1, 13),
       |  i -> (strpos('0123456789abcdef',
       |          substr(md5($expr), CAST(i AS INTEGER), 1)) - 1)
       |       * power(16, 12 - i))) AS BIGINT)""".stripMargin

  val qs: Seq[Q] = Seq(
    Q(
      "a_kmv_distinct",
      """KMV distinct-count estimation per lineitem return flag: hash each
        |distinct order key to a 48-bit value (md5 prefix), keep the k=256
        |smallest per flag with the bounded-heap top-k AGGREGATE (shuffle
        |carries 256 values per flag, never the key set), and estimate
        |distinct = (k-1)*2^48 / kth_smallest in exact integer division.
        |The exact distinct count rides the same pass, so the output
        |calibrates the sketch (error in integer ppm). Groups with fewer
        |than k hashes fall back to the exact count — the KMV sketch IS
        |exact below k.""".stripMargin,
      Some(
        s"""WITH dk AS (SELECT DISTINCT l_returnflag AS flag, l_orderkey FROM lineitem),
           |hv AS (SELECT DISTINCT flag,
           |         ${duckHash48("CAST(l_orderkey AS VARCHAR)")} AS v
           |       FROM dk),
           |ex AS (SELECT flag, COUNT(*) AS n_exact FROM dk GROUP BY flag),
           |nv AS (SELECT flag, COUNT(*) AS n_hashes FROM hv GROUP BY flag),
           |kth AS (SELECT flag, v AS kth_v FROM (
           |  SELECT flag, v, ROW_NUMBER() OVER (PARTITION BY flag ORDER BY v) AS rn
           |  FROM hv) WHERE rn = $KmvK)
           |SELECT ex.flag, ex.n_exact, nv.n_hashes, kth.kth_v,
           |       COALESCE($KmvNum // kth.kth_v, ex.n_exact) AS est_distinct,
           |       ABS(COALESCE($KmvNum // kth.kth_v, ex.n_exact) - ex.n_exact)
           |         * 1000000 // ex.n_exact AS err_ppm
           |FROM ex JOIN nv USING (flag) LEFT JOIN kth ON ex.flag = kth.flag
           |ORDER BY ex.flag""".stripMargin),
      (s, dir) => {
        val dk = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"), col("l_orderkey"))
          .distinct()
        val hv = dk
          .withColumn("v",
            expr("conv(substring(md5(cast(l_orderkey as string)), 1, 12), 16, 10)")
              .cast("long"))
          .select("flag", "v").distinct()
        val ex = dk.groupBy("flag").agg(count(lit(1)).as("n_exact"))
        // bounded-heap k-smallest: score = -v (exact below 2^53), id = v
        val kth = hv.groupBy("flag")
          .agg(Vectors.topKByScore(-col("v").cast("double"), col("v"), KmvK).as("top"),
            count(lit(1)).as("n_hashes"))
          .select(col("flag"), col("n_hashes"),
            element_at(col("top"), KmvK).getField("id").as("kth_v"))
        ex.join(kth, "flag")
          .withColumn("est_distinct",
            coalesce(expr(s"$KmvNum div kth_v"), col("n_exact")))
          .select(col("flag"), col("n_exact"), col("n_hashes"), col("kth_v"),
            col("est_distinct"),
            expr("abs(est_distinct - n_exact) * 1000000 div n_exact").as("err_ppm"))
          .orderBy("flag")
      }),

    Q(
      "a_kmv_quantiles",
      """Quantile estimation from a bottom-k hash sample — the quantile
        |member of the sketch family (KMV estimates distincts from the
        |same primitive; here the k=64 rows with smallest md5-48 hash per
        |event type form a uniform without-replacement sample, and the
        |sample's order statistics estimate p50/p90). The sample is the
        |bounded-heap top-k AGGREGATE on negated hash, so map tasks keep
        |64 rows per group and the shuffle carries 64 x |types| NO MATTER
        |the corpus size — the property a percentile-over-100TB dashboard
        |needs when the exact collapsed-frame pass (a_group_percentiles)
        |is too wide. Sampled values ride as the heap's id (ties prefer
        |the smaller value, mirrored in the oracle's ORDER BY hash,
        |value). Estimates use the integer cross-multiplication cutoff
        |(sr*100 >= p*n, lower percentile); the exact percentiles ride
        |the same query via the collapsed value-frequency frame, so the
        |output calibrates the sketch (absolute micro-unit error per
        |cut). All integer — hash48 fits a double exactly for the heap
        |score, values are floor-micro.""".stripMargin,
      Some(
        s"""WITH hv AS (
           |  SELECT event_type AS typ,
           |         ${duckHash48("CAST(event_id AS VARCHAR)")} AS v,
           |         CAST(floor(value * 1000000) AS BIGINT) AS vm
           |  FROM events),
           |samp AS (
           |  SELECT typ, vm FROM (
           |    SELECT typ, vm, ROW_NUMBER() OVER (PARTITION BY typ ORDER BY v, vm) AS rn
           |    FROM hv) WHERE rn <= 64),
           |sst AS (
           |  SELECT typ, vm, ROW_NUMBER() OVER (PARTITION BY typ ORDER BY vm) AS sr,
           |         COUNT(*) OVER (PARTITION BY typ) AS sn
           |  FROM samp),
           |est AS (
           |  SELECT typ,
           |         CAST(MIN(CASE WHEN sr * 100 >= 50 * sn THEN vm END) AS BIGINT) AS est_p50,
           |         CAST(MIN(CASE WHEN sr * 100 >= 90 * sn THEN vm END) AS BIGINT) AS est_p90,
           |         CAST(MAX(sn) AS BIGINT) AS n_sample
           |  FROM sst GROUP BY typ),
           |freq AS (SELECT typ, vm, COUNT(*) AS f FROM hv GROUP BY typ, vm),
           |cum AS (
           |  SELECT typ, vm,
           |         SUM(f) OVER (PARTITION BY typ ORDER BY vm) AS cum,
           |         SUM(f) OVER (PARTITION BY typ) AS n
           |  FROM freq),
           |ex AS (
           |  SELECT typ,
           |         CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN vm END) AS BIGINT) AS exact_p50,
           |         CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN vm END) AS BIGINT) AS exact_p90,
           |         CAST(MAX(n) AS BIGINT) AS n_rows
           |  FROM cum GROUP BY typ)
           |SELECT est.typ AS event_type, n_rows, n_sample,
           |       est_p50, exact_p50, ABS(est_p50 - exact_p50) AS err_p50,
           |       est_p90, exact_p90, ABS(est_p90 - exact_p90) AS err_p90
           |FROM est JOIN ex ON est.typ = ex.typ
           |ORDER BY event_type""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
          .withColumn("v",
            expr("conv(substring(md5(cast(event_id as string)), 1, 12), 16, 10)")
              .cast("long"))
          .withColumn("vm", floor(col("value") * 1000000L).cast("long"))
          .withColumnRenamed("event_type", "typ")
        // the sketch: 64-row bottom-k hash sample per type, value rides
        // as the heap id (score ties prefer the smaller value — the
        // oracle's ORDER BY v, vm)
        val samp = ev.groupBy("typ")
          .agg(Vectors.topKByScore(-col("v").cast("double"), col("vm"), 64).as("top"))
          .select(col("typ"), explode(col("top")).as("e"))
          .select(col("typ"), col("e.id").as("vm"))
        val sw = Window.partitionBy("typ").orderBy("vm")
        val est = samp
          .withColumn("sr", row_number().over(sw))
          .withColumn("sn", count(lit(1)).over(Window.partitionBy("typ")))
          .groupBy("typ")
          .agg(
            min(when(col("sr") * 100 >= col("sn") * 50, col("vm"))).as("est_p50"),
            min(when(col("sr") * 100 >= col("sn") * 90, col("vm"))).as("est_p90"),
            max(col("sn")).as("n_sample"))
        // calibration side: exact percentiles over the collapsed
        // value-frequency frame (the a_group_percentiles discipline)
        val cum = ev.groupBy("typ", "vm").agg(count(lit(1)).as("f"))
          .withColumn("cum", sum("f").over(sw))
          .withColumn("n", sum("f").over(Window.partitionBy("typ")))
        val ex = cum.groupBy("typ")
          .agg(
            min(when(col("cum") * 100 >= col("n") * 50, col("vm"))).as("exact_p50"),
            min(when(col("cum") * 100 >= col("n") * 90, col("vm"))).as("exact_p90"),
            max(col("n")).as("n_rows"))
        est.join(ex, "typ")
          .select(col("typ").as("event_type"), col("n_rows"), col("n_sample"),
            col("est_p50"), col("exact_p50"),
            abs(col("est_p50") - col("exact_p50")).as("err_p50"),
            col("est_p90"), col("exact_p90"),
            abs(col("est_p90") - col("exact_p90")).as("err_p90"))
          .orderBy("event_type")
      }),

    Q(
      "a_hll_distinct",
      """HyperLogLog distinct-user estimation per event type — the
        |fixed-size cardinality sketch (KMV's k values shrink to m=64
        |REGISTERS). Hash each row to 48 bits (md5 prefix): low 6 bits
        |pick the register, the next 36 supply rho = trailing-zero count
        |+ 1; the sketch is MAX(rho) per register — an algebraic agg, so
        |map-side partials collapse duplicates before the shuffle, which
        |carries at most types x 64 single-byte registers NO MATTER the
        |corpus size (the property that makes HLL the 100 TB
        |count-distinct). The raw estimator alpha_64*m^2/sum(2^-M_j) is
        |computed with every term scaled by 2^36, so the register sum and
        |the division are exact BIGINT on both engines — no float, no
        |libm. The exact COUNT(DISTINCT) rides alongside: the output
        |calibrates the sketch in signed integer ppm (raw estimator, no
        |small-range correction — n_reg is emitted so a consumer can
        |apply one).""".stripMargin,
      Some(
        s"""WITH h AS (
           |  SELECT event_type, ${duckHash48("CAST(user_id AS VARCHAR)")} AS h
           |  FROM events),
           |r AS (
           |  SELECT event_type, h % 64 AS reg, (h // 64) % ${1L << 36} AS w
           |  FROM h),
           |rh AS (
           |  SELECT event_type, reg,
           |         CASE WHEN w = 0 THEN 36 ELSE length(bin(w & (-w))) END AS rho
           |  FROM r),
           |mj AS (SELECT event_type, reg, MAX(rho) AS m_j FROM rh GROUP BY 1, 2),
           |s AS (
           |  SELECT event_type,
           |         CAST(SUM(1::BIGINT << CAST(36 - m_j AS INTEGER)) AS BIGINT)
           |           + (64 - CAST(COUNT(*) AS BIGINT)) * ${1L << 36} AS s_all,
           |         CAST(COUNT(*) AS BIGINT) AS n_reg
           |  FROM mj GROUP BY 1),
           |ex AS (
           |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
           |  FROM events GROUP BY 1)
           |SELECT s.event_type, s.n_reg,
           |       CAST($HllNum // (1000 * s.s_all) AS BIGINT) AS est_distinct,
           |       ex.exact_distinct,
           |       CAST((($HllNum // (1000 * s.s_all)) - ex.exact_distinct) * 1000000
           |            // ex.exact_distinct AS BIGINT) AS err_ppm
           |FROM s JOIN ex USING (event_type)
           |ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
        val mj = hllRho(ev).groupBy("event_type", "reg").agg(max("rho").as("m_j"))
        val sAll = mj.groupBy("event_type")
          .agg(
            sum(expr("shiftleft(cast(1 as bigint), cast(36 - m_j as int))"))
              .as("s_present"),
            count(lit(1)).as("n_reg"))
          .withColumn("s_all",
            col("s_present") + (lit(64L) - col("n_reg")) * lit(1L << 36))
        val exact = ev.groupBy("event_type")
          .agg(countDistinct("user_id").as("exact_distinct"))
        sAll.join(exact, "event_type")
          .select(col("event_type"), col("n_reg"),
            expr(s"$HllNum div (1000 * s_all)").as("est_distinct"),
            col("exact_distinct"),
            expr(s"(($HllNum div (1000 * s_all)) - exact_distinct) * 1000000" +
              " div exact_distinct").as("err_ppm"))
          .orderBy("event_type")
      }),

    Q(
      "a_join_size_est",
      """JOIN-SIZE estimation from frequency-carrying key sketches — the
        |pre-flight cardinality estimate a cost-based planner wants
        |before committing to a join strategy: |A join B| = sum over
        |common keys of fA*fB, estimated from k=256-minimum-value
        |sketches where each sampled key CARRIES its side's frequency
        |(packed key*2^15+freq into the bounded-heap id — freq < 2^15
        |asserted loudly, not assumed). The sampled cross-moment scales
        |by 2^48/theta exactly like the theta intersection; keys hash
        |uniformly, so the sample is an unbiased end-biased estimator of
        |the true cross-moment. Per side: ONE per-key count agg + ONE
        |sketch agg; everything downstream is sample-sized. The exact
        |join size (user-keyed join of the two count tables) rides
        |alongside in signed ppm — estimator AND calibration in one
        |row.""".stripMargin,
      Some(
        s"""WITH fa AS (
           |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
           |  FROM events WHERE event_type = 'view' GROUP BY 1),
           |fb AS (
           |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
           |ha AS (SELECT ${duckHash48("CAST(user_id AS VARCHAR)")} AS v, f FROM fa),
           |hb AS (SELECT ${duckHash48("CAST(user_id AS VARCHAR)")} AS v, f FROM fb),
           |-- ORDER BY v, f: deterministic at the k-th boundary even if two
           |-- distinct keys collide on the 48-bit hash — matches the Spark
           |-- heap's tie rule, which ranks the packed id v*2^15+f (f < 2^15,
           |-- so (v, f) lexicographic == packed-id numeric order).
           |ra AS (SELECT v, f, ROW_NUMBER() OVER (ORDER BY v, f) AS rn FROM ha),
           |rb AS (SELECT v, f, ROW_NUMBER() OVER (ORDER BY v, f) AS rn FROM hb),
           |sa AS (SELECT v, f FROM ra WHERE rn <= $KmvK),
           |sb AS (SELECT v, f FROM rb WHERE rn <= $KmvK),
           |ta AS (SELECT COALESCE(MAX(CASE WHEN rn = $KmvK THEN v END),
           |                       ${1L << 48}) AS theta FROM ra),
           |tb AS (SELECT COALESCE(MAX(CASE WHEN rn = $KmvK THEN v END),
           |                       ${1L << 48}) AS theta FROM rb),
           |th AS (SELECT LEAST(ta.theta, tb.theta) AS theta FROM ta, tb),
           |cm AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_common_samples,
           |         CAST(COALESCE(SUM(sa.f * sb.f), 0) AS BIGINT) AS xmom
           |  FROM sa JOIN sb ON sa.v = sb.v, th
           |  WHERE sa.v < th.theta),
           |ex AS (
           |  SELECT CAST(COALESCE(SUM(fa.f * fb.f), 0) AS BIGINT) AS exact_join
           |  FROM fa JOIN fb ON fa.user_id = fb.user_id),
           |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a FROM fa),
           |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b FROM fb)
           |SELECT na.n_a, nb.n_b, th.theta, cm.n_common_samples,
           |       CAST(CAST(cm.xmom AS HUGEINT) * ${1L << 48}
           |            // GREATEST(th.theta, 1) AS BIGINT) AS est_join,
           |       ex.exact_join,
           |       CAST((CAST(cm.xmom AS HUGEINT) * ${1L << 48}
           |              // GREATEST(th.theta, 1)
           |             - ex.exact_join) * 1000000 // ex.exact_join AS BIGINT)
           |         AS err_ppm
           |FROM na, nb, th, cm, ex
           |ORDER BY n_a""".stripMargin),
      (s, dir) => {
        def side(t: String) = Tables.events(s, dir)
          .filter(col("event_type") === t)
          .groupBy("user_id").agg(count(lit(1)).as("f"))
          .withColumn("v",
            expr("conv(substring(md5(cast(user_id as string)), 1, 12), 16, 10)")
              .cast("long"))
          // pack invariant, asserted not assumed: freq >= 2^15 would
          // corrupt the (key, freq) packing
          .withColumn("packed",
            when(col("f") < 32768L, col("v") * 32768L + col("f"))
              .otherwise(raise_error(concat(lit("per-key freq "), col("f"),
                lit(" >= 2^15 breaks the v*2^15+f packing")))))
        def sketch(fx: org.apache.spark.sql.DataFrame) = fx
          .agg(Vectors.topKByScore(-col("v").cast("double"), col("packed"), KmvK)
            .as("top"), count(lit(1)).as("n_keys"))
          .select(col("n_keys"),
            coalesce(expr(s"element_at(top, $KmvK).id div 32768"),
              lit(1L << 48)).as("theta"),
            expr("transform(top, t -> t.id)").as("ids"))
        val fa = side("view").cutLineage()
        val fb = side("purchase").cutLineage()
        val ska = sketch(fa).cutLineage()
        val skb = sketch(fb).cutLineage()
        val sa = ska.select(explode(col("ids")).as("p"))
          .select(expr("p div 32768").as("v"), expr("p % 32768").as("f"))
        val sb = skb.select(explode(col("ids")).as("p"))
          .select(expr("p div 32768").as("v"), expr("p % 32768").as("fb"))
        val th = ska.select(col("theta").as("ta"))
          .crossJoin(skb.select(col("theta").as("tb")))
          .select(least(col("ta"), col("tb")).as("theta"))
        val cm = sa.join(sb, "v").crossJoin(broadcast(th))
          .filter(col("v") < col("theta"))
          .agg(count(lit(1)).as("n_common_samples"),
            coalesce(sum(expr("f * fb")), lit(0L)).as("xmom"))
        val ex = fa.select(col("user_id"), col("f").as("xa"))
          .join(fb.select(col("user_id"), col("f").as("xb")), "user_id")
          .agg(coalesce(sum(expr("xa * xb")), lit(0L)).as("exact_join"))
        ska.select(col("n_keys").as("n_a"))
          .crossJoin(broadcast(skb.select(col("n_keys").as("n_b"))))
          .crossJoin(broadcast(th))
          .crossJoin(broadcast(cm))
          .crossJoin(broadcast(ex))
          .select(col("n_a"), col("n_b"), col("theta"), col("n_common_samples"),
            expr(s"cast(cast(xmom as decimal(38,0)) * ${1L << 48}" +
              " div greatest(theta, 1) as bigint)").as("est_join"),
            col("exact_join"),
            expr(s"(cast(cast(xmom as decimal(38,0)) * ${1L << 48}" +
              " div greatest(theta, 1) as bigint) - exact_join)" +
              " * 1000000 div exact_join").as("err_ppm"))
          .orderBy("n_a")
      }),

    Q(
      "a_theta_intersect",
      """Set-INTERSECTION cardinality from KMV/theta sketches — the set
        |operation HLL cannot do and the reason Druid/DataSketches ship
        |theta sketches: per event type, keep the k=256 smallest 48-bit
        |user hashes (bounded-heap aggregate — the sketch); for each type
        |pair, theta = min(kth_A, kth_B) and the estimate counts SHARED
        |sample values below theta, scaled by 2^48/theta in exact integer
        |division. Every post-sketch stage (sample explode, pair join,
        |count) works on <= types x 256 rows — the corpus is scanned once
        |and never joined. Types with fewer than k distinct users keep
        |their FULL set (theta = 2^48), so the estimator degrades to the
        |exact intersection — both regimes exercised across the SFs. The
        |exact pairwise intersection rides alongside (user-keyed
        |self-join) to calibrate in signed ppm.""".stripMargin,
      Some(
        s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
           |hv AS (
           |  SELECT event_type, ${duckHash48("CAST(user_id AS VARCHAR)")} AS v
           |  FROM du),
           |rk AS (
           |  SELECT event_type, v,
           |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn
           |  FROM hv),
           |smp AS (SELECT event_type, v, rn FROM rk WHERE rn <= $KmvK),
           |th AS (
           |  SELECT event_type,
           |         COALESCE(MAX(CASE WHEN rn = $KmvK THEN v END), ${1L << 48})
           |           AS theta
           |  FROM smp GROUP BY 1),
           |pairs AS (
           |  SELECT a.event_type AS type_a, b.event_type AS type_b,
           |         LEAST(ta.theta, tb.theta) AS theta,
           |         CAST(COUNT(*) FILTER (
           |           WHERE a.v < LEAST(ta.theta, tb.theta)) AS BIGINT)
           |           AS n_common_samples
           |  FROM smp a
           |  JOIN smp b ON a.v = b.v AND a.event_type < b.event_type
           |  JOIN th ta ON ta.event_type = a.event_type
           |  JOIN th tb ON tb.event_type = b.event_type
           |  GROUP BY 1, 2, 3),
           |ex AS (
           |  SELECT a.event_type AS type_a, b.event_type AS type_b,
           |         CAST(COUNT(*) AS BIGINT) AS exact_common
           |  FROM du a JOIN du b
           |    ON a.user_id = b.user_id AND a.event_type < b.event_type
           |  GROUP BY 1, 2)
           |SELECT p.type_a, p.type_b, p.theta, p.n_common_samples,
           |       CAST(p.n_common_samples * ${1L << 48}
           |            // GREATEST(p.theta, 1) AS BIGINT) AS est_common,
           |       ex.exact_common,
           |       CAST((p.n_common_samples * ${1L << 48} // GREATEST(p.theta, 1)
           |             - ex.exact_common) * 1000000 // ex.exact_common AS BIGINT)
           |         AS err_ppm
           |FROM pairs p JOIN ex USING (type_a, type_b)
           |ORDER BY type_a, type_b""".stripMargin),
      (s, dir) => {
        val du = Tables.events(s, dir)
          .select(col("event_type"), col("user_id")).distinct()
        val hv = du.withColumn("v",
          expr("conv(substring(md5(cast(user_id as string)), 1, 12), 16, 10)")
            .cast("long"))
        // one bounded-heap pass per type: the k smallest hashes ARE the
        // sketch; theta is the kth (largest retained) or 2^48 when the
        // set fits entirely
        val sk = hv.groupBy("event_type")
          .agg(Vectors.topKByScore(-col("v").cast("double"), col("v"), KmvK)
            .as("top"))
          .select(col("event_type"),
            coalesce(element_at(col("top"), KmvK).getField("id"),
              lit(1L << 48)).as("theta"),
            col("top"))
          .cutLineage() // sketch table: types x (k+1) values, built once
        val smp = sk.select(col("event_type"),
          explode(col("top")).as("t")).select(col("event_type"),
          col("t").getField("id").as("v"))
        val th = sk.select(col("event_type"), col("theta"))
        val pairs = smp.as("a")
          .join(smp.as("b"),
            col("a.v") === col("b.v") && col("a.event_type") < col("b.event_type"))
          .join(broadcast(th.select(col("event_type").as("ta_t"),
            col("theta").as("theta_a"))), col("a.event_type") === col("ta_t"))
          .join(broadcast(th.select(col("event_type").as("tb_t"),
            col("theta").as("theta_b"))), col("b.event_type") === col("tb_t"))
          .withColumn("theta", least(col("theta_a"), col("theta_b")))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"), col("theta"))
          .agg(sum(when(col("a.v") < col("theta"), 1L).otherwise(0L))
            .as("n_common_samples"))
        val ex = du.as("a")
          .join(du.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("exact_common"))
        pairs.join(ex, Seq("type_a", "type_b"))
          .select(col("type_a"), col("type_b"), col("theta"),
            col("n_common_samples"),
            expr(s"n_common_samples * ${1L << 48} div greatest(theta, 1)")
              .as("est_common"),
            col("exact_common"),
            expr(s"(n_common_samples * ${1L << 48} div greatest(theta, 1)" +
              " - exact_common) * 1000000 div exact_common").as("err_ppm"))
          .orderBy("type_a", "type_b")
      }),

    Q(
      "w_hll_sliding_distinct",
      """Sliding-window distinct counts FROM MERGED SKETCHES — the
        |mergeability payoff that makes HLL the cube/rollup cardinality
        |primitive: per (type, day), a 64-register daily sketch is
        |materialized ONCE (types x days x 64 rows); each trailing 7-day
        |estimate then max-merges seven daily sketches — every stage
        |after the daily agg works on the SKETCH TABLE, never the raw
        |corpus, so a year of sliding windows costs 365x64 registers per
        |key instead of 365 rescans (contrast w_rolling_distinct, the
        |exact collapsed-frame twin, which must fan the distinct
        |(day,user) frame). The daily sketches fan to the <= 7 windows
        |they serve (calendar join against the BROADCAST corpus-days
        |list; leading windows are partial by trailing-window
        |convention), re-merge by MAX — the associativity the estimator
        |inherits by construction — and the exact 7-day distinct rides
        |alongside for ppm calibration.""".stripMargin,
      Some(
        s"""WITH ev AS (
           |  SELECT event_type, CAST(ts AS DATE) AS d, user_id FROM events),
           |h AS (
           |  SELECT event_type, d, ${duckHash48("CAST(user_id AS VARCHAR)")} AS h
           |  FROM ev),
           |rw AS (SELECT event_type, d, $duckHllRegW FROM h),
           |rh AS (SELECT event_type, d, reg, $duckHllRho FROM rw),
           |daily AS (
           |  SELECT event_type, d, reg, MAX(rho) AS m_j FROM rh GROUP BY 1, 2, 3),
           |cdays AS (SELECT DISTINCT d AS tday FROM ev),
           |fan AS (
           |  SELECT event_type, d + CAST(i AS INTEGER) AS tday, reg, m_j
           |  FROM daily, LATERAL (SELECT unnest(range(7)) AS i)),
           |merged AS (
           |  SELECT f.event_type, f.tday, f.reg, MAX(f.m_j) AS m_j
           |  FROM fan f JOIN cdays USING (tday)
           |  GROUP BY 1, 2, 3),
           |s AS (
           |  SELECT event_type, tday,
           |         CAST(SUM($duckHllTerm) AS BIGINT)
           |           + (64 - CAST(COUNT(*) AS BIGINT)) * ${1L << 36} AS s_all,
           |         CAST(COUNT(*) AS BIGINT) AS n_reg
           |  FROM merged GROUP BY 1, 2),
           |exd AS (SELECT DISTINCT event_type, d, user_id FROM ev),
           |exf AS (
           |  SELECT event_type, d + CAST(i AS INTEGER) AS tday, user_id
           |  FROM exd, LATERAL (SELECT unnest(range(7)) AS i)),
           |ex AS (
           |  SELECT e.event_type, e.tday,
           |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_7d
           |  FROM exf e JOIN cdays USING (tday) GROUP BY 1, 2)
           |SELECT s.event_type, s.tday, s.n_reg,
           |       CAST($HllNum // (1000 * s.s_all) AS BIGINT) AS est_7d,
           |       ex.exact_7d,
           |       CAST((($HllNum // (1000 * s.s_all)) - ex.exact_7d) * 1000000
           |            // ex.exact_7d AS BIGINT) AS err_ppm
           |FROM s JOIN ex USING (event_type, tday)
           |ORDER BY event_type, tday""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
        // materialized once (30 rows): both the sketch and the exact
        // branch broadcast it, and without the checkpoint each branch
        // would re-derive it with its own corpus scan + distinct exchange
        val cdays = ev.select(col("d").as("tday")).distinct().cutLineage()
        val daily = hllRho(ev)
          .groupBy("event_type", "d", "reg").agg(max("rho").as("m_j"))
        val merged = daily
          .withColumn("td", explode(sequence(lit(0), lit(6))))
          .withColumn("tday", expr("date_add(d, td)"))
          .join(broadcast(cdays), "tday")
          .groupBy("event_type", "tday", "reg").agg(max("m_j").as("m_j"))
        val est = merged.groupBy("event_type", "tday")
          .agg(
            sum(expr("shiftleft(cast(1 as bigint), cast(36 - m_j as int))"))
              .as("s_present"),
            count(lit(1)).as("n_reg"))
          .withColumn("s_all",
            col("s_present") + (lit(64L) - col("n_reg")) * lit(1L << 36))
        val exact = ev.distinct()
          .withColumn("td", explode(sequence(lit(0), lit(6))))
          .withColumn("tday", expr("date_add(d, td)"))
          .join(broadcast(cdays), "tday")
          .groupBy("event_type", "tday")
          .agg(countDistinct("user_id").as("exact_7d"))
        est.join(exact, Seq("event_type", "tday"))
          .select(col("event_type"), col("tday"), col("n_reg"),
            expr(s"$HllNum div (1000 * s_all)").as("est_7d"),
            col("exact_7d"),
            expr(s"(($HllNum div (1000 * s_all)) - exact_7d) * 1000000" +
              " div exact_7d").as("err_ppm"))
          .orderBy("event_type", "tday")
      }),

    Q(
      "j_bloom_prefilter",
      """Bloom-filter pre-filtered semi-join: the supplier keys of one
        |nation (nationkey 7) pack into a 1008-bit two-hash Bloom bitset
        |(16 packed 63-bit BIGINT blocks — the sign bit stays clear so the
        |shift arithmetic is identical and overflow-free on both engines),
        |built by bit_or aggregation and broadcast as one
        |row; the lineitem scan probes it ROW-LOCALLY (two md5-derived bit
        |positions, shift-and-mask on the packed blocks) before anything
        |shuffles — the explicit form of a runtime bloom filter. The query
        |reports, per return flag, total rows, bloom passes, exact
        |members, and false positives; the oracle recomputes the exact
        |same bitset and probe, so the hash compare pins the filter's
        |selectivity bit for bit.""".stripMargin,
      Some {
        val h1 = duckHash48("CAST(s_suppkey AS VARCHAR)")
        val p1 = duckHash48("CAST(l_suppkey AS VARCHAR)")
        s"""WITH keys AS (
           |  SELECT s_suppkey, $h1 % 1008 AS pos1,
           |         ${duckHash48("'b' || CAST(s_suppkey AS VARCHAR)")} % 1008 AS pos2
           |  FROM supplier WHERE s_nationkey = 7),
           |bits AS (
           |  SELECT pos // 63 AS block, BIT_OR(1::BIGINT << CAST(pos % 63 AS INTEGER)) AS mask
           |  FROM (SELECT pos1 AS pos FROM keys UNION ALL SELECT pos2 FROM keys)
           |  GROUP BY 1),
           |blocks AS (
           |  SELECT list(COALESCE(bits.mask, 0) ORDER BY r.j) AS m
           |  FROM (SELECT unnest(range(0, 16)) AS j) r
           |  LEFT JOIN bits ON bits.block = r.j),
           |probe AS (
           |  SELECT l_returnflag AS flag, l_suppkey,
           |         $p1 % 1008 AS q1,
           |         ${duckHash48("'b' || CAST(l_suppkey AS VARCHAR)")} % 1008 AS q2
           |  FROM lineitem),
           |hit AS (
           |  SELECT flag, l_suppkey,
           |         ((m[CAST(q1 // 63 AS INTEGER) + 1] >> CAST(q1 % 63 AS INTEGER)) & 1) = 1
           |         AND ((m[CAST(q2 // 63 AS INTEGER) + 1] >> CAST(q2 % 63 AS INTEGER)) & 1) = 1
           |           AS bloom_pass,
           |         l_suppkey IN (SELECT s_suppkey FROM keys) AS exact_member
           |  FROM probe, blocks)
           |SELECT flag,
           |       COUNT(*) AS n_rows,
           |       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           |       CAST(SUM(CASE WHEN exact_member THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           |       CAST(SUM(CASE WHEN bloom_pass AND NOT exact_member THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_false_pos
           |FROM hit
           |GROUP BY flag
           |ORDER BY flag""".stripMargin
      },
      (s, dir) => {
        def hash48(sqlExpr: String) =
          expr(s"cast(conv(substring(md5($sqlExpr), 1, 12), 16, 10) as bigint)")
        val keys = Tables.supplier(s, dir)
          .filter(col("s_nationkey") === 7)
          .select(col("s_suppkey"),
            (hash48("cast(s_suppkey as string)") % 1008).as("pos1"),
            (hash48("concat('b', cast(s_suppkey as string))") % 1008).as("pos2"))
        // 16 packed 64-bit blocks built by ONE bit_or aggregation over the
        // (tiny) key set, then collapsed to a single broadcastable row
        val positions = keys.select(col("pos1").as("pos"))
          .unionAll(keys.select(col("pos2").as("pos")))
        val blocks = positions
          .groupBy(expr("cast(pos div 63 as int)").as("block"))
          .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(pos % 63 as int)))")
            .as("mask"))
        val maskRow = blocks
          .groupBy()
          .agg(map_from_arrays(collect_list(col("block")), collect_list(col("mask")))
            .as("mm"))
          .select(array((0 until 16).map(j =>
            coalesce(element_at(col("mm"), j), lit(0L))): _*).as("m"))
        val memberSet = keys.select(col("s_suppkey"))
        val probe = Tables.lineitem(s, dir)
          .select(col("l_returnflag").as("flag"), col("l_suppkey"))
          .withColumn("q1", hash48("cast(l_suppkey as string)") % 1008)
          .withColumn("q2", hash48("concat('b', cast(l_suppkey as string))") % 1008)
          .crossJoin(broadcast(maskRow))
          .withColumn("bloom_pass",
            expr("shiftright(element_at(m, cast(q1 div 63 as int) + 1), cast(q1 % 63 as int)) & 1") === 1 &&
              expr("shiftright(element_at(m, cast(q2 div 63 as int) + 1), cast(q2 % 63 as int)) & 1") === 1)
          .join(broadcast(memberSet.withColumn("exact_hit", lit(true))),
            col("l_suppkey") === col("s_suppkey"), "left")
          .withColumn("exact_member", coalesce(col("exact_hit"), lit(false)))
        probe.groupBy("flag")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
            sum(when(col("exact_member"), 1L).otherwise(0L)).as("n_exact"),
            sum(when(col("bloom_pass") && !col("exact_member"), 1L).otherwise(0L))
              .as("n_false_pos"))
          .orderBy("flag")
      }),

    Q(
      "a_countmin_heavy",
      """Count-min sketch heavy-hitter estimation, calibrated against the
        |exact counts: a deterministic Zipf-like key stream (key =
        |1024 div ((event_id % 1024) + 1), frequency ~ 1/k^2 — the top key
        |carries half the stream) feeds a depth-4 x width-64 counter grid;
        |each occurrence increments one md5-derived cell per row, and a
        |key's estimate is the MIN over its 4 cells. The build is the
        |textbook distributed CMS: per-task state is the CONSTANT d x w
        |grid (map-side combine collapses occurrences into cells before
        |the 256-cell shuffle) — no key-space-sized state anywhere, which
        |is the whole point at 100 TB. The grid collapses to one
        |broadcast row; probes (every distinct key with its exact count —
        |the calibration side) estimate row-locally. overest = est -
        |exact is provably >= 0 (CMS never underestimates) and the hash
        |compare pins every cell and estimate bit-for-bit.""".stripMargin,
      Some {
        def h48(e: String) =
          s"""CAST(list_sum(list_transform(range(1, 13),
             |  i -> (strpos('0123456789abcdef',
             |          substr(md5($e), CAST(i AS INTEGER), 1)) - 1)
             |       * power(16, 12 - i))) AS BIGINT)""".stripMargin
        s"""WITH stream AS (
           |  SELECT 1024 // ((event_id % 1024) + 1) AS k FROM events),
           |cells AS (
           |  SELECT r,
           |         ${h48("'r' || CAST(r AS VARCHAR) || '|' || CAST(k AS VARCHAR)")} % 64 AS pos,
           |         CAST(COUNT(*) AS BIGINT) AS c
           |  FROM stream CROSS JOIN range(4) t(r) GROUP BY 1, 2),
           |m AS (
           |  SELECT list(COALESCE(cells.c, 0) ORDER BY g.j) AS m
           |  FROM (SELECT unnest(range(0, 256)) AS j) g
           |  LEFT JOIN cells ON cells.r * 64 + cells.pos = g.j),
           |ex AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_exact FROM stream GROUP BY k),
           |probe AS (
           |  SELECT k, n_exact,
           |         LEAST(
           |           m[CAST(${h48("'r0|' || CAST(k AS VARCHAR)")} % 64 AS INTEGER) + 1],
           |           m[CAST(${h48("'r1|' || CAST(k AS VARCHAR)")} % 64 + 64 AS INTEGER) + 1],
           |           m[CAST(${h48("'r2|' || CAST(k AS VARCHAR)")} % 64 + 128 AS INTEGER) + 1],
           |           m[CAST(${h48("'r3|' || CAST(k AS VARCHAR)")} % 64 + 192 AS INTEGER) + 1])
           |           AS est
           |  FROM ex, m)
           |SELECT k, n_exact, est,
           |       est - n_exact AS overest,
           |       (est - n_exact) * 1000000 // n_exact AS err_ppm
           |FROM probe ORDER BY k""".stripMargin
      },
      (s, dir) => {
        def hash48(e: String) =
          expr(s"cast(conv(substring(md5($e), 1, 12), 16, 10) as bigint)")
        val stream = Tables.events(s, dir)
          .select(expr("1024 div ((event_id % 1024) + 1)").as("k"))
        val cells = stream
          .select(col("k"), explode(sequence(lit(0), lit(3))).as("r"))
          .withColumn("pos",
            hash48("concat('r', cast(r as string), '|', cast(k as string))") % 64)
          .groupBy("r", "pos").agg(count(lit(1)).as("c"))
        val mRow = cells.groupBy()
          .agg(map_from_arrays(
            collect_list((col("r") * 64 + col("pos")).cast("long")),
            collect_list(col("c"))).as("mm"))
          .select(array((0 until 256).map(j =>
            coalesce(element_at(col("mm"), lit(j.toLong)), lit(0L))): _*).as("m"))
        val ex = stream.groupBy("k").agg(count(lit(1)).as("n_exact"))
        def cell(r: Int) = element_at(col("m"),
          ((hash48(s"concat('r$r|', cast(k as string))") % 64) + r * 64)
            .cast("int") + 1)
        ex.crossJoin(broadcast(mRow))
          .withColumn("est", least(cell(0), cell(1), cell(2), cell(3)))
          .select(col("k"), col("n_exact"), col("est"),
            (col("est") - col("n_exact")).as("overest"),
            expr("(est - n_exact) * 1000000 div n_exact").as("err_ppm"))
          .orderBy("k")
      }),

    Q(
      "a_bitmap_distinct",
      """EXACT distinct counting by bitmap — the deterministic companion to
        |the HLL/KMV estimators: dense integer ids land in 63-bit blocks
        |(block = id div 63, bit = 1 << (id mod 63); 63 keeps the sign bit
        |clear so DuckDB's checked shift and Spark agree), blocks OR together
        |with bit_or, and the distinct count is the popcount sum. This is the
        |roaring-bitmap idea reduced to its relational core: the shuffle
        |carries (key, block) -> one long instead of every raw id, so the
        |reduction is ~63x smaller than count(distinct)'s expand-exchange,
        |and blocks distribute — no single reducer sees a whole key. The
        |exact COUNT(DISTINCT) runs side-by-side and diff_vs_exact pins the
        |bitmap count to it (0 everywhere); ids are asserted non-negative
        |(raise_error), since a negative id would flip the shift semantics.""".stripMargin,
      Some(
        """WITH blocks AS (
          |  -- ids asserted >= 0 on the Spark side (raise_error); negative
          |  -- ids would make div/mod and the shift diverge cross-engine
          |  SELECT event_type, CAST(ts AS DATE) AS day, user_id // 63 AS blk,
          |         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS bits
          |  FROM events GROUP BY 1, 2, 3),
          |bm AS (
          |  SELECT event_type, day, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_bitmap,
          |         COUNT(*) AS n_blocks
          |  FROM blocks GROUP BY 1, 2),
          |ex AS (
          |  SELECT event_type, CAST(ts AS DATE) AS day,
          |         COUNT(DISTINCT user_id) AS n_exact
          |  FROM events GROUP BY 1, 2)
          |SELECT bm.event_type, bm.day, n_bitmap, n_blocks, n_exact,
          |       n_bitmap - n_exact AS diff_vs_exact
          |FROM bm JOIN ex ON bm.event_type = ex.event_type AND bm.day = ex.day
          |ORDER BY bm.event_type, bm.day""".stripMargin),
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          col("event_type"), col("ts").cast("date").as("day"),
          when(col("user_id") >= 0, col("user_id")).otherwise(raise_error(concat(
            lit("a_bitmap_distinct: negative user_id "), col("user_id").cast("string"),
            lit(" breaks the div/mod block encoding")))).as("uid"))
        val bm = ev
          .groupBy(col("event_type"), col("day"), expr("uid div 63").as("blk"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(uid % 63 AS INT)))").as("bits"))
          .groupBy("event_type", "day")
          .agg(
            sum(bit_count(col("bits"))).cast("bigint").as("n_bitmap"),
            count(lit(1)).as("n_blocks"))
        val ex = ev.groupBy("event_type", "day")
          .agg(countDistinct(col("uid")).as("n_exact"))
        bm.join(ex, Seq("event_type", "day"))
          .select(
            col("event_type"), col("day"), col("n_bitmap"), col("n_blocks"),
            col("n_exact"), (col("n_bitmap") - col("n_exact")).as("diff_vs_exact"))
          .orderBy("event_type", "day")
      }))
}
