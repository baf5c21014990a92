package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geospatial operators — the domain the catalog did not yet cover.
  *
  * The test tables carry no coordinates, so points are CLOSED-FORM
  * functions of the keys (the same trick the multimodal family uses for
  * pixels): `x = ((k % 1000003) * 48271) % 1000000`, and similarly for
  * `y` with an independent prime/multiplier. Both engines evaluate the
  * identical integer arithmetic, so the oracle "knows" every location
  * without any data exchange — the hash compare then proves the SPATIAL
  * machinery (grid bucketing, neighbor expansion, distance predicates,
  * trajectory windows), not the synthetic geometry.
  *
  * Scale notes that apply to the whole family:
  *  - all geometry is integer micro-degrees on a 10^6 x 10^6 grid; no
  *    floating point, no trig (great-circle math would drag libm in —
  *    planar L2/L1 metrics carry the same plan shapes);
  *  - the multiplies stay far below 2^63 because keys are reduced mod a
  *    ~10^6 prime BEFORE scaling (replica key shifts of copy*10^8 simply
  *    redistribute the points);
  *  - every query is either scan-side + one keyed aggregate or one
  *    window over a user-keyed partition — the shapes that bucket
  *    cleanly on a 1000-executor cluster.
  */
object GeoQueries {

  /** micro-degree x coordinate of an integer key (both engines). */
  private def gxSql(k: String) = s"(($k % 1000003) * 48271) % 1000000"
  private def gySql(k: String) = s"(($k % 999983) * 69621) % 1000000"

  private val CellSz = 100000L          // grid cell edge; >= radius, so 3x3 covers
  // (cellX, cellY) -> single join key pack. INVARIANT: must stay strictly
  // greater than the largest reachable cell index PLUS the ±1 neighbor
  // offset (indices run 0..(10^6 / CellSz - 1); offsets reach -1 and
  // max+1), or edge cells alias — (x, -1) packing to (x-1, CellPack-1)
  // would silently join the wrong neighborhood if CellSz were ever
  // reduced. 10^5 keeps six orders of headroom over the current 0..9
  // domain; retune it WITH CellSz.
  private val CellPack = 100000L
  private val R2 = 3600000000L          // radius 60000 micro-degrees, squared
  private val PackK = 100000000000L     // 10^11: d2-dominant (d2, suppkey) pack

  val qs: Seq[Q] = Seq(
    Q(
      "geo_grid_join",
      """Spatial radius join via grid-cell bucketing — the canonical
        |distributed alternative to an all-pairs distance join: every
        |supplier point is replicated into its 3x3 cell neighborhood
        |(cell edge >= radius, so no within-radius pair can escape the
        |neighborhood), customers probe their OWN cell only, and the
        |exact squared-distance predicate runs on the collision-sized
        |candidate set. Per customer with >= 1 supplier inside 60k
        |micro-degrees: neighbor count, exact min squared distance, and
        |the nearest supplier (min-pack argmin, d2-dominant with suppkey
        |tiebreak; pack in DECIMAL(38,0)/HUGEINT since d2*10^11 exceeds
        |2^63, suppkey asserted < 10^11 by raise_error). Scale shape:
        |candidate pairs are bounded by cell co-location (never |C|x|S|);
        |the 9x-replicated supplier side carries NO broadcast hint — the
        |threshold auto-broadcasts it at these sizes, and when the cell
        |frame outgrows it the SAME call site flips to a cell-keyed
        |shuffle join (round 12: a hard hint here contradicted this very
        |sentence — AQE cannot unpin an explicit hint; flip executed in
        |StrategyInvarianceSpec) — the standard spatial-join recipe
        |either way.""".stripMargin,
      Some(
        s"""WITH c AS (
           |  SELECT c_custkey,
           |         ${gxSql("c_custkey")} AS cx, ${gySql("c_custkey")} AS cy
           |  FROM customer),
           |s AS (
           |  SELECT s_suppkey,
           |         ${gxSql("s_suppkey")} AS sx, ${gySql("s_suppkey")} AS sy
           |  FROM supplier),
           |sg AS (
           |  SELECT s_suppkey, sx, sy,
           |         ((sx // $CellSz) + dx.d) * $CellPack + ((sy // $CellSz) + dy.d)
           |           AS cell
           |  FROM s
           |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
           |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy),
           |pairs AS (
           |  SELECT c.c_custkey, sg.s_suppkey,
           |         (c.cx - sg.sx) * (c.cx - sg.sx)
           |           + (c.cy - sg.sy) * (c.cy - sg.sy) AS d2
           |  FROM c JOIN sg
           |    ON (c.cx // $CellSz) * $CellPack + (c.cy // $CellSz) = sg.cell
           |  WHERE (c.cx - sg.sx) * (c.cx - sg.sx)
           |          + (c.cy - sg.sy) * (c.cy - sg.sy) <= $R2)
           |SELECT c_custkey,
           |       CAST(COUNT(*) AS BIGINT) AS n_near,
           |       CAST(MIN(CAST(d2 AS HUGEINT) * $PackK + s_suppkey)
           |              // $PackK AS BIGINT) AS min_d2,
           |       CAST(MIN(CAST(d2 AS HUGEINT) * $PackK + s_suppkey)
           |              % $PackK AS BIGINT) AS nearest_supp
           |FROM pairs
           |GROUP BY 1
           |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val cust = Tables.customer(s, dir).select(
          col("c_custkey"),
          expr(gxSql("c_custkey")).as("cx"),
          expr(gySql("c_custkey")).as("cy"))
        val supp = Tables.supplier(s, dir).select(
          // pack safety: suppkey must stay below the 10^11 pack modulus
          // (replica shifts add copy*10^8 — an order of magnitude of slack)
          when(col("s_suppkey") >= 0 && col("s_suppkey") < PackK, col("s_suppkey"))
            .otherwise(raise_error(concat(
              lit("geo_grid_join pack overflow: s_suppkey "), col("s_suppkey"))))
            .as("s_suppkey"),
          expr(gxSql("s_suppkey")).as("sx"),
          expr(gySql("s_suppkey")).as("sy"))
        val sg = supp
          .withColumn("dx", explode(array(lit(-1), lit(0), lit(1))))
          .withColumn("dy", explode(array(lit(-1), lit(0), lit(1))))
          .withColumn("cell",
            expr(s"((sx div $CellSz) + dx) * $CellPack + ((sy div $CellSz) + dy)"))
        val probe = cust.withColumn("cell",
          expr(s"(cx div $CellSz) * $CellPack + (cy div $CellSz)"))
        probe.join(sg, "cell")
          .withColumn("d2",
            (col("cx") - col("sx")) * (col("cx") - col("sx"))
              + (col("cy") - col("sy")) * (col("cy") - col("sy")))
          .filter(col("d2") <= R2)
          .withColumn("pack",
            col("d2").cast("decimal(38,0)") * PackK + col("s_suppkey"))
          .groupBy("c_custkey")
          .agg(
            count(lit(1)).as("n_near"),
            min(col("pack")).as("pack"))
          .select(
            col("c_custkey"),
            col("n_near"),
            expr(s"cast(pack div $PackK as bigint)").as("min_d2"),
            expr(s"cast(pack % $PackK as bigint)").as("nearest_supp"))
          .orderBy("c_custkey")
      }),

    Q(
      "geo_trajectory_stats",
      """Trajectory analytics — the spatio-temporal window pass a
        |mobility pipeline runs per entity: each event is a timestamped
        |point (location a closed-form function of user_id and event_id
        |on a 1000x1000 grid), ordered per user by (ts, event_id); a lag
        |window yields consecutive steps, and one user-keyed aggregate
        |emits points, moves, total L1 (Manhattan) path length, longest
        |single step, and bounding-box area — all exact integers (L1
        |avoids sqrt; an L2 path would be irrational and un-hashable).
        |Scale shape: ONE user-keyed shuffle serves both the lag window
        |and the final aggregate; no self-joins, no per-user iteration —
        |the partition-window-aggregate shape that buckets cleanly.""".stripMargin,
      Some(
        """WITH pts AS (
          |  SELECT user_id, ts, event_id,
          |         ((user_id * 31 + event_id * 17) % 1000003) % 1000 AS x,
          |         ((user_id * 13 + event_id * 7) % 999983) % 1000 AS y
          |  FROM events),
          |steps AS (
          |  SELECT user_id, x, y,
          |         LAG(x) OVER w AS lx, LAG(y) OVER w AS ly
          |  FROM pts
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT user_id,
          |       CAST(COUNT(*) AS BIGINT) AS n_points,
          |       CAST(COUNT(lx) AS BIGINT) AS n_moves,
          |       CAST(COALESCE(SUM(ABS(x - lx) + ABS(y - ly)), 0) AS BIGINT) AS path_l1,
          |       CAST(COALESCE(MAX(ABS(x - lx) + ABS(y - ly)), 0) AS BIGINT) AS max_step,
          |       CAST((MAX(x) - MIN(x)) * (MAX(y) - MIN(y)) AS BIGINT) AS bbox_area
          |FROM steps
          |GROUP BY 1
          |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("((user_id * 31 + event_id * 17) % 1000003) % 1000").as("x"),
            expr("((user_id * 13 + event_id * 7) % 999983) % 1000").as("y"))
          .withColumn("lx", lag("x", 1).over(w))
          .withColumn("ly", lag("y", 1).over(w))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_points"),
            count(col("lx")).as("n_moves"),
            coalesce(sum(abs(col("x") - col("lx")) + abs(col("y") - col("ly"))), lit(0L))
              .cast("long").as("path_l1"),
            coalesce(max(abs(col("x") - col("lx")) + abs(col("y") - col("ly"))), lit(0L))
              .cast("long").as("max_step"),
            ((max("x") - min("x")) * (max("y") - min("y"))).cast("long").as("bbox_area"))
          .orderBy("user_id")
      }),

    Q(
      "geo_knn_ranked",
      """Bounded k-nearest-neighbor join (k = 3 within the 60k
        |micro-degree radius) — the ranked companion to geo_grid_join's
        |min-only aggregate: each customer gets its 3 closest in-radius
        |suppliers WITH ranks and exact squared distances, the shape a
        |"nearest depots" feature join produces. The radius bound is
        |what keeps grid kNN EXACT and distributed: with cell edge >=
        |radius, the 3x3 neighborhood provably contains every in-radius
        |supplier, so no expanding-ring fallback is ever needed (an
        |unbounded kNN cannot make that guarantee and degenerates to
        |multi-pass). Candidates are cell-collision-bounded, ranking is
        |a per-customer window over the in-radius candidate set only
        |(never the supplier table), ties break on supplier key —
        |deterministic. The replicated supplier side carries NO
        |broadcast hint (round 12 — same rationale as geo_grid_join):
        |the threshold auto-broadcasts it at these sizes, and at
        |equal-sized sides the identical call site shuffles on the
        |cell key (flip executed in StrategyInvarianceSpec).
        |STATUS (round 15 adjudication): this window form is the
        |retained A/B CONTROL, not the 100 TB path. Under fixed-domain
        |densification it shuffles and sorts the density-quadratic
        |in-radius pair set before discarding all but 3 — measured asym
        |eff 2.75 @20x vs the bounded-heap twin's 1.68 in the same
        |session (SCALECURVE20_GEO). geo_knn_adaptive computes the
        |identical answer (same oracle SQL, hash-matched) with the
        |per-customer top-3 folded map-side, and is the CANONICAL kNN
        |for any dense deployment; this form stays in-catalog as the
        |measured baseline that proves the twin's advantage.""".stripMargin,
      Some(
        s"""WITH c AS (
           |  SELECT c_custkey,
           |         ${gxSql("c_custkey")} AS cx, ${gySql("c_custkey")} AS cy
           |  FROM customer),
           |s AS (
           |  SELECT s_suppkey,
           |         ${gxSql("s_suppkey")} AS sx, ${gySql("s_suppkey")} AS sy
           |  FROM supplier),
           |sg AS (
           |  SELECT s_suppkey, sx, sy,
           |         ((sx // $CellSz) + dx.d) * $CellPack + ((sy // $CellSz) + dy.d)
           |           AS cell
           |  FROM s
           |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
           |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy),
           |pairs AS (
           |  SELECT c.c_custkey, sg.s_suppkey,
           |         (c.cx - sg.sx) * (c.cx - sg.sx)
           |           + (c.cy - sg.sy) * (c.cy - sg.sy) AS d2
           |  FROM c JOIN sg
           |    ON (c.cx // $CellSz) * $CellPack + (c.cy // $CellSz) = sg.cell
           |  WHERE (c.cx - sg.sx) * (c.cx - sg.sx)
           |          + (c.cy - sg.sy) * (c.cy - sg.sy) <= $R2)
           |SELECT c_custkey, CAST(rk AS BIGINT) AS rk, s_suppkey,
           |       CAST(d2 AS BIGINT) AS d2
           |FROM (SELECT c_custkey, s_suppkey, d2,
           |             ROW_NUMBER() OVER (PARTITION BY c_custkey
           |                                ORDER BY d2, s_suppkey) AS rk
           |      FROM pairs)
           |WHERE rk <= 3
           |ORDER BY c_custkey, rk""".stripMargin),
      (s, dir) => {
        val cust = Tables.customer(s, dir).select(
          col("c_custkey"),
          expr(gxSql("c_custkey")).as("cx"),
          expr(gySql("c_custkey")).as("cy"))
        val supp = Tables.supplier(s, dir).select(
          col("s_suppkey"),
          expr(gxSql("s_suppkey")).as("sx"),
          expr(gySql("s_suppkey")).as("sy"))
        val sg = supp
          .withColumn("dx", explode(array(lit(-1), lit(0), lit(1))))
          .withColumn("dy", explode(array(lit(-1), lit(0), lit(1))))
          .withColumn("cell",
            expr(s"((sx div $CellSz) + dx) * $CellPack + ((sy div $CellSz) + dy)"))
        val probe = cust.withColumn("cell",
          expr(s"(cx div $CellSz) * $CellPack + (cy div $CellSz)"))
        val pairs = probe.join(sg, "cell")
          .withColumn("d2",
            (col("cx") - col("sx")) * (col("cx") - col("sx"))
              + (col("cy") - col("sy")) * (col("cy") - col("sy")))
          .filter(col("d2") <= R2)
        pairs
          .withColumn("rk", row_number().over(
            Window.partitionBy("c_custkey").orderBy("d2", "s_suppkey"))
            .cast("long"))
          .filter(col("rk") <= 3)
          .select(col("c_custkey"), col("rk"), col("s_suppkey"),
            col("d2").cast("long").as("d2"))
          .orderBy("c_custkey", "rk")
      }),

    Q(
      "geo_knn_adaptive",
      """Density-adaptive kNN — the same answer as geo_knn_ranked,
        |computed with the bounded-heap top-k AGGREGATE instead of a
        |row_number window. Why it exists: under fixed-domain
        |densification (the replica generator's regime, and any hot urban
        |cell at 100 TB) in-radius candidates per customer grow linearly
        |with density, so the window form shuffles a density-quadratic
        |pair set to the customer's partition and SORTS each group before
        |discarding all but 3. Here each map task keeps at most 3
        |candidates per customer in a primitive-array heap DURING the
        |cell join's own stage — the shuffle carries <= 3 x |customers per
        |map partition| rows and no sort ever sees the candidate set, so
        |every stage downstream of the scan-side distance test is bounded
        |by k regardless of densification. The candidate DISTANCE TESTS
        |remain density-quadratic — any exact radius-bounded kNN must
        |examine each in-radius pair (constant work per candidate, the
        |same optimal shape as geo_grid_join) — which is why this is the
        |100 TB path PLANS.md promised rather than a constant-factor
        |tweak: the quadratic term is confined to codegen'd integer
        |arithmetic at the scan, never a shuffle or a sort. Oracle is the
        |identical window SQL, so the hash compare doubles as the
        |aggregate's bit-equivalence proof (ann_topk_agg precedent;
        |d2 <= 2*10^12 < 2^53 is exact in the double score, tiebreak
        |id-ascending matches ORDER BY d2, s_suppkey).
        |STATUS (round 15 adjudication): this is the CANONICAL 100 TB
        |kNN path — measured asym eff 1.68 @20x vs the window form's
        |2.75 in the same session; geo_knn_ranked is retained as the
        |A/B control that proves this advantage.""".stripMargin,
      Some(
        s"""WITH c AS (
           |  SELECT c_custkey,
           |         ${gxSql("c_custkey")} AS cx, ${gySql("c_custkey")} AS cy
           |  FROM customer),
           |s AS (
           |  SELECT s_suppkey,
           |         ${gxSql("s_suppkey")} AS sx, ${gySql("s_suppkey")} AS sy
           |  FROM supplier),
           |sg AS (
           |  SELECT s_suppkey, sx, sy,
           |         ((sx // $CellSz) + dx.d) * $CellPack + ((sy // $CellSz) + dy.d)
           |           AS cell
           |  FROM s
           |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
           |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy),
           |pairs AS (
           |  SELECT c.c_custkey, sg.s_suppkey,
           |         (c.cx - sg.sx) * (c.cx - sg.sx)
           |           + (c.cy - sg.sy) * (c.cy - sg.sy) AS d2
           |  FROM c JOIN sg
           |    ON (c.cx // $CellSz) * $CellPack + (c.cy // $CellSz) = sg.cell
           |  WHERE (c.cx - sg.sx) * (c.cx - sg.sx)
           |          + (c.cy - sg.sy) * (c.cy - sg.sy) <= $R2)
           |SELECT c_custkey, CAST(rk AS BIGINT) AS rk, s_suppkey,
           |       CAST(d2 AS BIGINT) AS d2
           |FROM (SELECT c_custkey, s_suppkey, d2,
           |             ROW_NUMBER() OVER (PARTITION BY c_custkey
           |                                ORDER BY d2, s_suppkey) AS rk
           |      FROM pairs)
           |WHERE rk <= 3
           |ORDER BY c_custkey, rk""".stripMargin),
      (s, dir) => {
        import graft.functions.Vectors
        val cust = Tables.customer(s, dir).select(
          col("c_custkey"),
          expr(gxSql("c_custkey")).as("cx"),
          expr(gySql("c_custkey")).as("cy"))
        val supp = Tables.supplier(s, dir).select(
          col("s_suppkey"),
          expr(gxSql("s_suppkey")).as("sx"),
          expr(gySql("s_suppkey")).as("sy"))
        val sg = supp
          .withColumn("dx", explode(array(lit(-1), lit(0), lit(1))))
          .withColumn("dy", explode(array(lit(-1), lit(0), lit(1))))
          .withColumn("cell",
            expr(s"((sx div $CellSz) + dx) * $CellPack + ((sy div $CellSz) + dy)"))
        val probe = cust.withColumn("cell",
          expr(s"(cx div $CellSz) * $CellPack + (cy div $CellSz)"))
        probe.join(sg, "cell")
          .withColumn("d2",
            (col("cx") - col("sx")) * (col("cx") - col("sx"))
              + (col("cy") - col("sy")) * (col("cy") - col("sy")))
          .filter(col("d2") <= R2)
          // score = -d2 (DESC-best aggregate <-> ASC-best distance); the
          // negation is exact in double for every reachable d2
          .groupBy("c_custkey")
          .agg(Vectors.topKByScore(
            -col("d2").cast("double"), col("s_suppkey").cast("long"), 3).as("top"))
          .select(col("c_custkey"), posexplode(col("top")))
          .select(
            col("c_custkey"),
            (col("pos") + 1).cast("long").as("rk"),
            col("col.id").as("s_suppkey"),
            (-col("col.score")).cast("long").as("d2"))
          .orderBy("c_custkey", "rk")
      })
  )
}
