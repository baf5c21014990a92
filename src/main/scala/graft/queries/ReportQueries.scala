package graft.queries

import graft.functions.{Num, Status}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The §3.1 relational-report path: full-outer comparison + pivot report
  * (SURVEY.md J2, A3, F12, W1-adjacent).
  */
object ReportQueries {
  import Num.{d, dec}

  val qs: Seq[Q] = Seq(
    Q(
      "j2_full_outer_report",
      """J2 + F12: the joined_df2/pivot_report core (main.py:303-310,
        |384-409). Two independently aggregated sides keyed by a case-folded
        |description (duplicate names fan in, as the reference's duplicate
        |"Description" rows do), full-outer joined, classified with the F12
        |match ladder. Quirk preserved: the reference compares quantities as
        |STRINGS (main.py:401) — string equality of the same double is value
        |equality, so the oracle uses numeric equality.
        |Scale: both sides pre-aggregate to |distinct names| rows before the
        |join — the shuffle is key-cardinality-sized, not input-sized.""".stripMargin,
      Some(
        """WITH jde AS (
          |  SELECT lower(p_name) AS description,
          |         SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS jde_dec,
          |         COUNT(*) AS n_items
          |  FROM part GROUP BY 1),
          |ops AS (
          |  SELECT lower(p.p_name) AS description,
          |         SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS ops_dec
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          |  GROUP BY 1)
          |SELECT COALESCE(jde.description, ops.description) AS description,
          |       CAST(jde.jde_dec AS DOUBLE) AS jde_qoh,
          |       CAST(ops.ops_dec AS DOUBLE) AS ops_qty,
          |       jde.n_items,
          |       CASE WHEN jde.jde_dec IS NULL OR ops.ops_dec IS NULL THEN 'Missing Data'
          |            WHEN jde.jde_dec = ops.ops_dec THEN 'Match'
          |            ELSE 'Mismatch' END AS match_status
          |FROM jde FULL OUTER JOIN ops ON jde.description = ops.description
          |ORDER BY description""".stripMargin),
      (s, dir) => {
        val part = Tables.part(s, dir)
        val jde = part
          .groupBy(lower(col("p_name")).as("description"))
          .agg(sum(dec(col("p_retailprice"))).as("jde_dec"), count(lit(1)).as("n_items"))
        val ops = Tables.lineitem(s, dir)
          .join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy(lower(col("p_name")).as("description"))
          .agg(sum(dec(col("l_quantity"))).as("ops_dec"))
        jde.join(ops, Seq("description"), "full_outer")
          .select(
            col("description"),
            d(col("jde_dec")).as("jde_qoh"),
            d(col("ops_dec")).as("ops_qty"),
            col("n_items"),
            Status.matchStatus(col("jde_dec"), col("ops_dec")).as("match_status"))
          .orderBy("description")
      }),

    Q(
      "a3_pivot_first",
      """A3: pivot report first()-aggregation (main.py:384-393). The
        |reference takes pandas group order; we impose an explicit total
        |order (l_orderkey, l_linenumber) and take row 1 per group —
        |deterministic in both engines, documented divergence from pandas
        |insertion order.""".stripMargin,
      Some(
        """SELECT l_partkey,
          |       l_quantity AS first_qty,
          |       l_returnflag AS first_flag,
          |       l_shipdate::DATE AS first_ship
          |FROM (SELECT l_partkey, l_quantity, l_returnflag, l_shipdate,
          |             ROW_NUMBER() OVER (PARTITION BY l_partkey
          |                                ORDER BY l_orderkey, l_linenumber) AS rn
          |      FROM lineitem)
          |WHERE rn = 1
          |ORDER BY l_partkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("l_partkey").orderBy("l_orderkey", "l_linenumber")
        Tables.lineitem(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("l_partkey"),
            col("l_quantity").as("first_qty"),
            col("l_returnflag").as("first_flag"),
            col("l_shipdate").cast("date").as("first_ship"))
          .orderBy("l_partkey")
      }),

    Q(
      "a_unpivot_roundtrip",
      """Wide→long (UNPIVOT/melt), proved as the inverse of the pivot:
        |counts pivot to one column per language, unpivot melts them back
        |to (source, lang, n_docs), and absent combinations (null cells)
        |drop out — so the oracle is simply the direct GROUP BY the
        |round-trip must reproduce. Unpivot is a row-local generator
        |(no shuffle beyond the pivot's own aggregate).""".stripMargin,
      Some(
        """SELECT source, lang, COUNT(*) AS n_docs
          |FROM documents
          |GROUP BY source, lang
          |ORDER BY source, lang""".stripMargin),
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val wide = Tables.documents(s, dir)
          .groupBy("source")
          .pivot("lang", langs)
          .agg(count(lit(1)))
        wide.unpivot(
          Array(col("source")),
          langs.map(col).toArray,
          "lang", "n_docs")
          .filter(col("n_docs").isNotNull)
          .orderBy("source", "lang")
      }))
}
