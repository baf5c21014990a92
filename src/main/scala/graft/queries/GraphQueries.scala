package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the order graph — the PageRank
  * companion to the connected-components operators (ops/
  * ConnectedComponents.scala): fixed-iteration rank propagation with
  * EXACT integer arithmetic, so the oracle hash-compares the ranks
  * themselves, not a float approximation.
  *
  * Graph: the bipartite customer↔supplier trade graph (distinct pairs
  * from orders ⋈ lineitem, both directions, supplier ids offset by 10^6
  * to keep the node spaces disjoint — key spaces stay far below that at
  * every tested SF). Ranks live in integer micro-units (10^12 total mass
  * split per node); each iteration is base + d·inflow with d = 85/100 in
  * floor division — deterministic on both engines, no float anywhere.
  *
  * Scale shape: each iteration is one join of the rank vector to the
  * edge list on src plus one dst-keyed aggregation — the canonical
  * pre-partitionable PageRank step (at cluster scale both sides would be
  * bucketed by node id so the per-iteration shuffle disappears; the
  * iteration count is fixed at 3, so the plan is 3 chained join+agg
  * stages, not a driver loop over actions).
  */
object GraphQueries {

  private val Iters = 3
  private val SupplierOffset = 1000000L
  private val Mass = 1000000000000L // 10^12 micro-units of total rank

  /** The reusable fixed-iteration PageRank core: `edges(src, dst)` →
    * `(id, r)` final integer micro-unit ranks. Materializes the graph
    * once (localCheckpoint) so each iteration re-reads rather than
    * re-derives it; every arithmetic step is bigint floor division, so
    * the result is engine/partitioning-independent. A hot destination
    * (everyone links the hub) is safe at scale because the dst-inflow
    * aggregation is algebraic — map-side partial agg collapses the hot
    * key's contributions per task before the shuffle
    * (ScaleStressSpec proves the closed form on a 2·10^5-spoke star). */
  def pagerank(edgesIn: org.apache.spark.sql.DataFrame, iters: Int)
      : org.apache.spark.sql.DataFrame = {
    val edges = edgesIn.localCheckpoint()
    val nodes = edges.select(col("src").as("id")).distinct().localCheckpoint()
    val nRow = nodes.agg(count(lit(1)).as("n"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    val base = expr(s"(15 * ($Mass div n)) div 100")
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("id"), expr(s"$Mass div n").as("r"))
    (1 to iters).foreach { _ =>
      val inflow = edges
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(expr("r div outdeg")).as("inflow"))
      ranks = nodes.crossJoin(broadcast(nRow))
        .join(inflow, Seq("id"), "left")
        .select(col("id"),
          (base + expr("(85 * coalesce(inflow, 0)) div 100")).as("r"))
    }
    ranks
  }

  val qs: Seq[Q] = Seq(
    Q(
      "g_pagerank",
      s"""PageRank ($Iters fixed iterations, damping 85/100, integer
         |micro-unit arithmetic) over the bipartite customer↔supplier
         |trade graph. r0 = 10^12 div n per node; each step
         |r' = (15·r0) div 100 + (85·Σ inflow) div 100 with per-edge
         |contribution r div outdeg — every operation integer floor
         |division, so the oracle matches rank-for-rank. Output: every
         |node's final rank.""".stripMargin,
      Some(
        s"""WITH pairs AS (
           |  SELECT DISTINCT o.o_custkey AS c, $SupplierOffset + l.l_suppkey AS s
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |edges AS (
           |  SELECT c AS src, s AS dst FROM pairs
           |  UNION ALL
           |  SELECT s AS src, c AS dst FROM pairs),
           |nodes AS (SELECT DISTINCT src AS id FROM edges),
           |nn AS (SELECT COUNT(*) AS n FROM nodes),
           |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
           |r0 AS (SELECT id, $Mass // nn.n AS r FROM nodes, nn),
           |r1 AS (
           |  SELECT nodes.id,
           |         (15 * ($Mass // nn.n)) // 100
           |         + (85 * COALESCE(f.inflow, 0)) // 100 AS r
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (
           |    SELECT e.dst AS id, CAST(SUM(r0.r // deg.outdeg) AS BIGINT) AS inflow
           |    FROM edges e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.src
           |    GROUP BY e.dst) f ON nodes.id = f.id),
           |r2 AS (
           |  SELECT nodes.id,
           |         (15 * ($Mass // nn.n)) // 100
           |         + (85 * COALESCE(f.inflow, 0)) // 100 AS r
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (
           |    SELECT e.dst AS id, CAST(SUM(r1.r // deg.outdeg) AS BIGINT) AS inflow
           |    FROM edges e JOIN r1 ON e.src = r1.id JOIN deg ON e.src = deg.src
           |    GROUP BY e.dst) f ON nodes.id = f.id),
           |r3 AS (
           |  SELECT nodes.id,
           |         (15 * ($Mass // nn.n)) // 100
           |         + (85 * COALESCE(f.inflow, 0)) // 100 AS r
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (
           |    SELECT e.dst AS id, CAST(SUM(r2.r // deg.outdeg) AS BIGINT) AS inflow
           |    FROM edges e JOIN r2 ON e.src = r2.id JOIN deg ON e.src = deg.src
           |    GROUP BY e.dst) f ON nodes.id = f.id)
           |SELECT id,
           |       CASE WHEN id >= $SupplierOffset THEN 'supplier' ELSE 'customer' END
           |         AS node_type,
           |       r AS rank_micro
           |FROM r3
           |ORDER BY id""".stripMargin),
      (s, dir) => {
        val pairs = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"),
            (lit(SupplierOffset) + col("l_suppkey")).as("s"))
          .distinct()
        val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
          .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
        pagerank(edges, Iters)
          .select(col("id"),
            when(col("id") >= SupplierOffset, lit("supplier"))
              .otherwise(lit("customer")).as("node_type"),
            col("r").as("rank_micro"))
          .orderBy("id")
      }))
}
