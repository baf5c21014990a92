package graft.queries

import graft.engine.Reconcile
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Core relational catalog: the flagship reconciliation plus the scan /
  * filter / join / aggregate spine (SURVEY.md §2.1, §2.3, §2.4 J1/J5,
  * §2.5 A1/A2, §2.6 W1).
  */
object CoreQueries {
  import Num.{d, dec, one}

  val qs: Seq[Q] = Seq(
    Q(
      "flagship_reconcile",
      """The reference's core semantic (SURVEY.md §3.2/§7.2): per-key totals
        |on two independent sides (A1+A2), full-outer joined (J2), classified
        |with the 0.001-epsilon status ladder (P8+F11). JDE side = order
        |totals per customer; ops side = customer account balances.""".stripMargin,
      Some(
        """WITH jde AS (
          |  SELECT o_custkey AS k, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS jde_dec
          |  FROM orders GROUP BY 1),
          |ops AS (
          |  SELECT c_custkey AS k, SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS ops_dec
          |  FROM customer GROUP BY 1)
          |SELECT COALESCE(jde.k, ops.k) AS k,
          |       CAST(jde_dec AS DOUBLE) AS jde_qty,
          |       CAST(ops_dec AS DOUBLE) AS ops_qty,
          |       CASE WHEN ops_dec IS NULL THEN 'Product Not Found'
          |            WHEN jde_dec IS NULL THEN 'Missing in JDE'
          |            WHEN ABS(jde_dec - ops_dec) > 0.001 THEN 'Mismatch'
          |            ELSE 'Match' END AS status
          |FROM jde FULL OUTER JOIN ops ON jde.k = ops.k
          |ORDER BY k""".stripMargin),
      (s, dir) =>
        Reconcile.reconcile(
          Tables.orders(s, dir), col("o_custkey"), col("o_totalprice"),
          Tables.customer(s, dir), col("c_custkey"), col("c_acctbal"))
          .orderBy("k")),

    Q(
      "a1_qty_per_flag",
      """A1-style grouped decimal sums (TPC-H Q1 shape): hash aggregate with
        |map-side partial combine; exact decimal arithmetic end-to-end.""".stripMargin,
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
          |       -- ROUND to 4 dp BEFORE the double cast: the product sum is
          |       -- DECIMAL(38,8) and at sf>=0.1 its unscaled value exceeds
          |       -- double's 53-bit exact range, where DuckDB's int128->double
          |       -- conversion rounds differently from Spark's BigDecimal by
          |       -- 1 ulp; at scale 4 the value is exactly representable.
          |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
          |                * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue,
          |       COUNT(*) AS n
          |FROM lineitem
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            d(sum(dec(col("l_quantity")))).as("sum_qty"),
            d(sum(dec(col("l_extendedprice")))).as("sum_base"),
            d(round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))), 4)).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus")),

    Q(
      "j1_item_branch_join",
      """J1: inner equi-join item-master analog (part, broadcast — it is the
        |small dimension) against the transaction fact (lineitem), aggregated
        |per brand. At scale: broadcast hash join, zero shuffle of the fact
        |side beyond the final 25-key aggregate.""".stripMargin,
      Some(
        """SELECT p_brand,
          |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |       COUNT(*) AS n
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |GROUP BY p_brand
          |ORDER BY p_brand""".stripMargin),
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(
            d(sum(dec(col("l_extendedprice")))).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("p_brand")),

    Q(
      "p5_p6_event_filter",
      """P5 (IN-list type filter) + P6 (event-time lower bound) + P12
        |(positive-value guard) + projection. All three predicates reach the
        |parquet scan as PushedFilters.""".stripMargin,
      Some(
        """SELECT event_id, user_id, event_type, CAST(ts AS DATE) AS event_date, value
          |FROM events
          |WHERE event_type IN ('purchase', 'error')
          |  AND ts >= TIMESTAMP '2024-01-15 00:00:00'
          |  AND value > 0
          |ORDER BY event_id""".stripMargin),
      (s, dir) =>
        // the time bound goes through eventsSince, which places it on the
        // RAW scanned column (long nanos or native timestamp, whichever
        // this testdata generation carries) so it reaches the parquet scan
        // as a PushedFilter and skips row groups
        Tables.eventsSince(s, dir, 1705276800000000000L)
          .filter(
            col("event_type").isin("purchase", "error") &&
              col("value") > 0)
          .select(
            col("event_id"), col("user_id"), col("event_type"),
            col("ts").cast("date").as("event_date"), col("value"))
          .orderBy("event_id")),

    Q(
      "j5_anti_dispatched",
      """J5: exactly-once dispatch anti-join — drop rows whose key already
        |appears in the 'done' status set (orders with status F stand in for
        |the dispatched set).""".stripMargin,
      Some(
        """SELECT l_orderkey, l_linenumber, l_quantity
          |FROM lineitem l
          |WHERE NOT EXISTS (SELECT 1 FROM orders o
          |                  WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
          |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(
            Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")),

    Q(
      "w1_max_per_group",
      """W1: max-per-group row selection (CompareData.js:28-42) as a
        |row_number window with a deterministic total tiebreak.""".stripMargin,
      Some(
        """SELECT l_partkey, l_orderkey, l_linenumber, l_quantity
          |FROM (SELECT l_partkey, l_orderkey, l_linenumber, l_quantity,
          |             ROW_NUMBER() OVER (PARTITION BY l_partkey
          |                                ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
          |      FROM lineitem)
          |WHERE rn = 1
          |ORDER BY l_partkey""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("l_partkey")
          .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
        Tables.lineitem(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("l_partkey", "l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_partkey")
      }))
}
