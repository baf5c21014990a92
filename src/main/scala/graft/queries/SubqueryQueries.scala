package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery / decorrelation family: correlated scalar subqueries, EXISTS /
  * NOT EXISTS chains, null-aware NOT IN, and nested semi-joins — the
  * optimizer surface the rest of the catalog reaches only in its already-
  * decorrelated (hand-joined) form.
  *
  * Why this matters at 100 TB: a correlated subquery evaluated per row is a
  * nested loop over the fact table — O(rows × subquery). Catalyst's
  * decorrelation (RewriteCorrelatedScalarSubquery, RewritePredicateSubquery,
  * MergeScalarSubqueries) turns each of these into ONE aggregate + ONE join,
  * so the plans below cost the same as their hand-written equivalents
  * elsewhere in the catalog. These queries pin that rewrite: the SQL text is
  * the per-row formulation, the physical plan must be the join formulation.
  *
  * Each query here is a single SQL string registered against temp views named
  * exactly like the parquet tables, so the SAME text runs on Spark and as the
  * DuckDB oracle — dialect drift is impossible by construction.
  */
object SubqueryQueries {

  /** Register the shared table views the SQL texts reference. Idempotent
    * (createOrReplace) — Verify/Bench call builds sequentially. */
  private def views(s: SparkSession, dir: String): Unit = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.supplier(s, dir).createOrReplaceTempView("supplier")
    Tables.part(s, dir).createOrReplaceTempView("part")
    Tables.nation(s, dir).createOrReplaceTempView("nation")
    Tables.region(s, dir).createOrReplaceTempView("region")
  }

  private def sqlQ(name: String, doc: String, sql: String): Q =
    Q(name, doc, Some(sql), (s: SparkSession, dir: String) => { views(s, dir); s.sql(sql) })

  /** TPC-H Q17 shape. The small-quantity threshold is the classic correlated
    * scalar AVG, phrased as `5q < sum/n` (⟺ q < avg/5): the numerator and
    * denominator are exact integers, `sum*1.0/n` is ONE IEEE division whose
    * operand tree is identical in both engines, and `5.0*q` is exact — so
    * the threshold boundary cannot drift cross-engine even when n divides
    * sum exactly. ONE correlated aggregate, not two: Catalyst's
    * RewriteCorrelatedScalarSubquery turns it into a per-partkey aggregate
    * left-outer-joined back to the fact — lineitem is scanned exactly twice
    * (outer + subquery aggregate), never per-row. */
  private val smallQtySql: String =
    """SELECT p_brand,
      |       COUNT(*) AS n_small,
      |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_size <= 10
      |  AND 5.0 * CAST(l.l_quantity AS BIGINT)
      |      < (SELECT CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS BIGINT) * 1.0 / COUNT(*)
      |         FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** TPC-H Q21 shape on the columns this data carries: suppliers who were
    * the ONLY returned-line supplier in a finished multi-supplier order.
    * One correlated EXISTS (another supplier exists in the order) plus one
    * correlated NOT EXISTS (no OTHER supplier has a returned line), both
    * with the non-equality suppkey correlation that forces the planner into
    * semi/anti joins carrying an extra join predicate — the decorrelation
    * case the simple key-equality semi-joins (j5) never reach. At scale:
    * both rewrites shuffle on l_orderkey only; no per-row re-scan. */
  private val onlyLateSql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey
      |  AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** NOT IN three-valued logic, proven by counting. The subquery set
    * contains one NULL (the lowest pending custkey, nullified), so ANSI
    * `NOT IN` must return UNKNOWN for every probe row — n_not_in is 0 —
    * while NOT EXISTS and the null-free NOT IN agree on the true anti-join
    * count. Spark plans the nullable NOT IN as a null-aware anti join
    * (BroadcastHashJoin isNullAware) rather than the O(n²) nested loop a
    * naive 3VL implementation needs — that plan property is pinned in
    * PlanShapeSpec. */
  private val notIn3vlSql: String =
    """WITH sub AS (
      |  SELECT NULLIF(o_custkey,
      |                (SELECT MIN(o_custkey) FROM orders WHERE o_orderstatus = 'P')) AS k
      |  FROM orders WHERE o_orderstatus = 'P')
      |SELECT
      |  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT k FROM sub)) AS n_not_in,
      |  (SELECT COUNT(*) FROM customer c
      |   WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey)) AS n_not_exists,
      |  (SELECT COUNT(*) FROM customer
      |   WHERE c_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL)) AS n_not_in_nullfree""".stripMargin

  /** TPC-H Q20 shape: suppliers whose shipped quantity of the scoped part
    * family ('b…'-named parts, via a nested IN semi-join) exceeds the average
    * supplier's share by >15% (20·sq·n > 23·tot — the uniform generator
    * concentrates shares near 1.0, so a 2× bar is empty at every SF; 1.15×
    * yields 1/13/137 suppliers at sf0.001/0.01/0.1, non-degenerate
    * everywhere). The share threshold is computed by window
    * aggregates over the ALREADY-AGGREGATED supplier frame (dimension-sized,
    * one reference — no CTE re-inlining on either engine), and the compare
    * runs in integers (`20*sq*n_s > 23*tot`) so no division touches the
    * boundary.
    * At scale: one semi-join (partkey), one supplier-keyed aggregate, one
    * broadcast-sized window frame. */
  private val nestedInTopshareSql: String =
    """WITH scoped AS (
      |  SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'b%')
      |  GROUP BY l_suppkey),
      |ranked AS (
      |  SELECT l_suppkey, sq,
      |         CAST(COUNT(*) OVER () AS BIGINT) AS n_s,
      |         CAST(SUM(sq)  OVER () AS BIGINT) AS tot
      |  FROM scoped)
      |SELECT s_name, sq AS shipped_qty
      |FROM supplier JOIN ranked ON s_suppkey = l_suppkey
      |WHERE 20 * sq * n_s > 23 * tot
      |ORDER BY s_name""".stripMargin

  /** TPC-H Q22 shape: high-balance customers with no RECENT orders (none
    * since 2000-01-01 — the generator gives every customer at least one
    * order overall, so the unqualified anti join is empty at every SF;
    * the recency predicate makes it 5/55/646 rows at sf0.001/0.01/0.1),
    * per segment. Uncorrelated scalar aggregate (positive-balance stats,
    * broadcast as one row) + correlated NOT EXISTS (anti join on o_custkey
    * with the date residual pushed to the orders scan). The
    * above-average compare runs in integer tenth-cents (`bal*n > sum`), so
    * the boundary is exact on both engines; DuckDB's HUGEINT widening and
    * Spark's BIGINT agree because both sides are explicitly CAST. */
  private val existsSegmentSql: String =
    """WITH stats AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
      |         CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS sum_t
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c_mktsegment,
      |       COUNT(*) AS n_rich_inactive,
      |       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_bal
      |FROM customer c, stats
      |WHERE CAST(CAST(c.c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT) * stats.n_pos > stats.sum_t
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Correlated LATERAL derived table with ORDER BY + LIMIT: per-part
    * latest-3 shipments. The per-row reading ("for each part, run this
    * ordered limited scan") is the nested-loop trap; Spark's
    * DecorrelateInnerQuery rewrites the correlated LIMIT into a rank
    * window partitioned by the correlation key — one lineitem shuffle on
    * l_partkey, identical to the hand-written w1 top-k. The probe-set
    * filter (every 101st part) keeps the output bounded at any SF. */
  private val lateralTopkSql: String =
    """SELECT p.p_partkey, t.l_orderkey, t.l_linenumber, t.ship_day
      |FROM part p,
      |LATERAL (SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day
      |         FROM lineitem l
      |         WHERE l.l_partkey = p.p_partkey
      |         ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC
      |         LIMIT 3) t
      |WHERE p.p_partkey % 101 = 0
      |ORDER BY p.p_partkey, t.ship_day DESC, t.l_orderkey DESC, t.l_linenumber DESC""".stripMargin

  val qs: Seq[Q] = Seq(
    sqlQ(
      "sq_lateral_topk",
      """Correlated LATERAL subquery with ORDER BY + LIMIT (per-part latest-3
        |shipments). Catalyst decorrelates the correlated LIMIT into a rank
        |window partitioned by the correlation key — the per-row ordered scan
        |the SQL describes never happens; the plan is the same single-shuffle
        |top-k as the hand-written window form.""".stripMargin,
      lateralTopkSql),
    sqlQ(
      "sq_scalar_small_qty",
      """Correlated scalar subquery (TPC-H Q17 shape): per-brand small-quantity
        |revenue where the threshold is each part's own average quantity.
        |Catalyst decorrelates the per-row subquery into one per-partkey
        |aggregate left-outer-joined to the fact — lineitem is scanned twice,
        |never per-row. The `5q < sum·1.0/n` phrasing keeps the threshold
        |boundary bit-exact across engines (integer operands, one shared IEEE
        |division).""".stripMargin,
      smallQtySql),
    sqlQ(
      "sq_exists_only_late",
      """Correlated EXISTS + NOT EXISTS chain with non-equality correlation
        |(TPC-H Q21 shape): the only returned-line supplier in finished
        |multi-supplier orders. Decorrelates to a semi join and an anti join on
        |l_orderkey, each carrying the suppkey<>suppkey residual predicate.""".stripMargin,
      onlyLateSql),
    sqlQ(
      "sq_not_in_3vl",
      """ANSI NOT IN three-valued logic, proven by counting: a NULL planted in
        |the subquery set forces n_not_in to 0 (every probe is UNKNOWN), while
        |NOT EXISTS and null-free NOT IN agree on the true anti count. Pins
        |Spark's null-aware anti join — 3VL without a nested loop.""".stripMargin,
      notIn3vlSql),
    sqlQ(
      "sq_nested_in_topshare",
      """Nested IN semi-join + window-derived data-driven threshold (TPC-H Q20
        |shape): suppliers shipping >15% above the average supplier's share
        |of the 'b'-part family (integer compare 20*sq*n_s > 23*tot); the
        |window frame is the already-aggregated dimension-sized supplier set.""".stripMargin,
      nestedInTopshareSql),
    sqlQ(
      "sq_exists_segment",
      """Uncorrelated scalar aggregate + correlated NOT EXISTS (TPC-H Q22
        |shape): above-average-balance customers with no orders, per market
        |segment. One broadcast stats row, one anti join; integer tenth-cent
        |compare keeps the above-average boundary exact.""".stripMargin,
      existsSegmentSql),

    sqlQ(
      "sq_relational_division",
      """Relational DIVISION — the textbook operator SQL forgot
        |("customers who have ordered in EVERY priority class"),
        |phrased as the correlated-scalar-count division (coverage
        |count per customer = divisor cardinality). The canonical
        |double-NOT-EXISTS form references the outer customer key two
        |correlation levels deep, which Catalyst rejects
        |(UNRESOLVED_COLUMN) — the scalar-count twin is the
        |single-level form both planners decorrelate: Catalyst
        |rewrites it into a per-customer aggregate over the DISTINCT
        |(customer, priority) coverage frame joined back to customer,
        |so coverage (at most |C|x5 rows), not the fact table, is what
        |the division compares. The divisor cardinality is an
        |uncorrelated scalar (one-row broadcast). The divisor is the
        |UNSHIFTED priority domain deliberately: replica key shifts
        |multiply key-derived divisors (a region-based division goes
        |vacuously empty at 5x — every copy sees only its own 5
        |regions), while the priority domain stays 5 at every scale,
        |so the at-scale hash actually exercises the ALL-quantifier.
        |Same SQL text runs on both engines — the hash pins the
        |decorrelation SEMANTICS, not just the arithmetic.""".stripMargin,
      divisionSql))

  // referenced from qs above, so this must stay lazy (plain vals
  // initialize in declaration order and would still be null here)
  private lazy val divisionSql: String =
    """WITH cov AS (
      |  SELECT DISTINCT o_custkey AS c, o_orderpriority AS pr
      |  FROM orders)
      |SELECT cu.c_custkey,
      |       (SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
      |        FROM orders) AS n_priorities
      |FROM customer cu
      |WHERE (SELECT COUNT(DISTINCT cov.pr) FROM cov
      |       WHERE cov.c = cu.c_custkey)
      |      = (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
      |ORDER BY cu.c_custkey""".stripMargin
}
