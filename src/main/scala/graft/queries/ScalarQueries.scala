package graft.queries

import graft.functions.{Keys, Num, Quantities, Units}
import graft.ops.JsonExpand
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Scalar-function library exercised as oracle-checked queries
  * (SURVEY.md §2.8 F1-F18). Unit codes / lots / prefixes are synthesized
  * deterministically from keys so both engines derive identical inputs.
  */
object ScalarQueries {
  import Num.{d, dec}

  private val unitDomain = Seq("KG", "EA", "LT", "GR", "ML", "XX")

  val qs: Seq[Q] = Seq(
    Q(
      "f1_f4_unit_conversion",
      """F1-F4 unit conversion library over a synthesized unit column
        |(utility.py:21-127). Covers the map hits, the lower/upper
        |fallbacks, the rate-unit maps, and F4's factor multiply (KG->g
        |x1000; everything else falls through the reference's silent x1.0).
        |The gram sum stays in exact integer arithmetic so the oracle
        |compare is order-independent.""".stripMargin,
      Some(
        """WITH u AS (
          |  SELECT p_size,
          |         ['KG','EA','LT','GR','ML','XX'][CAST((p_partkey % 6) + 1 AS INT)] AS unit
          |  FROM part)
          |SELECT unit,
          |       CASE unit WHEN 'KG' THEN 'kg' WHEN 'EA' THEN 'each' WHEN 'LT' THEN 'L'
          |                 WHEN 'GR' THEN 'g' WHEN 'ML' THEN 'mL' ELSE lower(unit) END AS lake_unit,
          |       CASE unit WHEN 'KG' THEN 'g/L' WHEN 'EA' THEN 'each/L' WHEN 'LT' THEN 'mL/L'
          |                 ELSE lower(unit) END AS rate_unit,
          |       unit AS jde_roundtrip,
          |       (unit <> 'XX') AS valid,
          |       COUNT(*) AS n,
          |       CAST(SUM(CASE WHEN unit = 'KG' THEN CAST(p_size AS BIGINT) * 1000
          |                     ELSE CAST(p_size AS BIGINT) END) AS BIGINT) AS grams
          |FROM u
          |GROUP BY unit
          |ORDER BY unit""".stripMargin),
      (s, dir) => {
        val u = Tables.part(s, dir).withColumn(
          "unit",
          element_at(
            array(unitDomain.map(lit): _*),
            (pmod(col("p_partkey"), lit(6)) + 1).cast(IntegerType)))
        u.groupBy("unit")
          .agg(
            first(Units.convertUnitFromJde(col("unit"))).as("lake_unit"),
            first(Units.convertRateUnitFromJde(col("unit"))).as("rate_unit"),
            first(Units.convertUnitToJde(Units.convertUnitFromJde(col("unit")))).as("jde_roundtrip"),
            first(Units.isValidUnit(col("unit"))).as("valid"),
            count(lit(1)).as("n"),
            sum(Units.convertUnitQuantity(col("unit"), lit("g"), col("p_size")).cast("long")).as("grams"))
          .orderBy("unit")
      }),

    Q(
      "f5_f7_transaction_ids",
      """F5-F7: quantity precision + byte-stable transaction identity
        |(utility.py:749-807, jde_helper.py:854-855). The quantity is a
        |4dp x 4dp decimal product so both engines quantize identically; the
        |id is name_lot_vessel_normalizedQty. This is the exactly-once
        |dispatch key — byte equality across engines is the whole point.""".stripMargin,
      Some(
        """SELECT l_orderkey, l_linenumber,
          |       rtrim(rtrim(CAST(CAST(CAST(l_quantity AS DECIMAL(18,4))
          |                              * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(38,9))
          |                        AS VARCHAR), '0'), '.') AS norm_qty,
          |       concat('item', CAST(l_partkey AS VARCHAR), '_',
          |              CAST(l_linenumber AS VARCHAR), '_',
          |              CAST(l_suppkey AS VARCHAR), '_',
          |              rtrim(rtrim(CAST(CAST(CAST(l_quantity AS DECIMAL(18,4))
          |                                     * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(38,9))
          |                               AS VARCHAR), '0'), '.')) AS txn_id
          |FROM lineitem
          |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val qtyCol = dec(col("l_quantity")) * dec(col("l_discount"))
        // sort FIRST on the raw key columns, project the expensive
        // decimal->string identity expressions AFTER: a global orderBy is
        // a range exchange whose key-sampling pass executes the full
        // child — projecting before the sort evaluated normalizeQty /
        // uniqueTransactionId twice (sample pass + map pass) and shuffled
        // the built strings; (l_orderkey, l_linenumber) is the lineitem
        // PK, so the order (and every row) is unchanged
        li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"), col("l_discount"))
          .orderBy("l_orderkey", "l_linenumber")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            Quantities.normalizeQty(qtyCol).as("norm_qty"),
            Quantities.uniqueTransactionId(
              concat(lit("item"), col("l_partkey").cast("string")),
              col("l_linenumber").cast("string"),
              col("l_suppkey").cast("string"),
              qtyCol).as("txn_id"))
      }),

    Q(
      "f8_f10_keys_ladder",
      """F8 batch_name, F9 lot extraction, F10 business-unit prefix ladder,
        |F16 note construction, F17 truncation, F18 compat hash id
        |(jde_helper.py:854-897, 876-887, 1000; main.py:1993-1997) over
        |synthesized prefixed names and nullable lots.""".stripMargin,
      Some(
        """WITH base AS (
          |  SELECT p_partkey, p_name,
          |         concat(['B_','P_','M_',''][CAST((p_partkey % 4) + 1 AS INT)], p_name) AS pname,
          |         CASE WHEN p_partkey % 3 = 0 THEN NULL
          |              ELSE concat('L', CAST(p_partkey AS VARCHAR)) END AS lot
          |  FROM part)
          |SELECT p_partkey,
          |       CASE WHEN lot IS NULL THEN pname ELSE concat(pname, '_', lot) END AS batch_name,
          |       CASE WHEN lot IS NULL THEN pname ELSE lot END AS lot_back,
          |       CASE WHEN pname LIKE 'P\_%' ESCAPE '\' THEN '1130'
          |            WHEN pname LIKE 'M\_%' ESCAPE '\' THEN '1120'
          |            ELSE '1110' END AS business_unit,
          |       concat('JDE_Transaction_Id: ', pname, ' BU ',
          |              CASE WHEN pname LIKE 'P\_%' ESCAPE '\' THEN '1130'
          |                   WHEN pname LIKE 'M\_%' ESCAPE '\' THEN '1120'
          |                   ELSE '1110' END) AS note,
          |       substr(repeat(p_name, 50), 1, 699) AS status_text,
          |       (p_partkey * 1103515245 + 12345) % 1000000 AS compat_id
          |FROM base
          |ORDER BY p_partkey""".stripMargin),
      (s, dir) => {
        val base = Tables.part(s, dir)
          .withColumn("pname",
            concat(
              element_at(array(lit("B_"), lit("P_"), lit("M_"), lit("")),
                (pmod(col("p_partkey"), lit(4)) + 1).cast(IntegerType)),
              col("p_name")))
          .withColumn("lot",
            when(pmod(col("p_partkey"), lit(3)) === 0, lit(null))
              .otherwise(concat(lit("L"), col("p_partkey").cast("string"))))
        val bu = Keys.businessUnit(col("pname"))
        base.select(
          col("p_partkey"),
          Keys.batchName(col("pname"), col("lot")).as("batch_name"),
          Keys.lotFromBatch(Keys.batchName(col("pname"), col("lot")), col("pname")).as("lot_back"),
          bu.as("business_unit"),
          concat(lit("JDE_Transaction_Id: "), col("pname"), lit(" BU "), bu).as("note"),
          Keys.truncateStatus(repeat(col("p_name"), 50)).as("status_text"),
          Keys.hashId(col("p_partkey")).as("compat_id"))
          .orderBy("p_partkey")
      }),

    Q(
      "f14_date_formats",
      """F14 date parsing/formatting (main.py:429-433, jde_helper.py:900):
        |JDE dd/MM/yyyy render, parse-back roundtrip, and the days_back
        |lookback predicate against a fixed anchor.""".stripMargin,
      Some(
        """SELECT o_orderkey,
          |       strftime(CAST(o_orderdate AS DATE), '%d/%m/%Y') AS jde_date,
          |       CAST(strptime(strftime(CAST(o_orderdate AS DATE), '%d/%m/%Y'), '%d/%m/%Y') AS DATE) AS roundtrip,
          |       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_back,
          |       (date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') <= 90) AS in_window
          |FROM orders
          |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val jdeDate = date_format(col("o_orderdate").cast("date"), "dd/MM/yyyy")
        val daysBack = datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
        Tables.orders(s, dir).select(
          col("o_orderkey"),
          jdeDate.as("jde_date"),
          to_date(jdeDate, "dd/MM/yyyy").as("roundtrip"),
          daysBack.as("days_back"),
          (daysBack <= 90).as("in_window"))
          .orderBy("o_orderkey")
      }),

    Q(
      "f19_sanitize",
      """F19 NaN/Inf sanitize (safe_convert_value, main.py:154-176):
        |ratios engineered to produce real +Inf / -Inf / NaN rows
        |(division by an exactly-zero double), sanitized to null exactly
        |as the reference does before JSON serialization; flags prove the
        |special values actually occurred. Pure scan-side expressions —
        |the only shuffle is the output-contract sort.""".stripMargin,
      Some(
        """WITH r AS (
          |  SELECT l_orderkey, l_linenumber,
          |         l_quantity / (l_discount - 0.05) AS qty_ratio_raw,
          |         (l_discount - 0.05) / (l_discount - 0.05) AS self_ratio_raw,
          |         -l_quantity / (l_discount - 0.05) AS neg_ratio_raw
          |  FROM lineitem)
          |SELECT l_orderkey, l_linenumber,
          |       COALESCE(isnan(self_ratio_raw), FALSE) AS was_nan,
          |       COALESCE(isinf(qty_ratio_raw), FALSE) AS was_inf,
          |       round(CASE WHEN isnan(qty_ratio_raw) OR isinf(qty_ratio_raw)
          |             THEN NULL ELSE qty_ratio_raw END, 6) AS qty_ratio,
          |       round(CASE WHEN isnan(self_ratio_raw) OR isinf(self_ratio_raw)
          |             THEN NULL ELSE self_ratio_raw END, 6) AS self_ratio,
          |       round(CASE WHEN isnan(neg_ratio_raw) OR isinf(neg_ratio_raw)
          |             THEN NULL ELSE neg_ratio_raw END, 6) AS neg_ratio
          |FROM r
          |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => {
        val denom = col("l_discount") - 0.05
        val qtyRatioRaw = col("l_quantity") / denom
        val selfRatioRaw = denom / denom
        val negRatioRaw = -col("l_quantity") / denom
        val isInf = (c: org.apache.spark.sql.Column) => abs(c) === Double.PositiveInfinity
        Tables.lineitem(s, dir).select(
          col("l_orderkey"), col("l_linenumber"),
          coalesce(isnan(selfRatioRaw), lit(false)).as("was_nan"),
          coalesce(isInf(qtyRatioRaw), lit(false)).as("was_inf"),
          round(Quantities.jsonSafe(qtyRatioRaw), 6).as("qty_ratio"),
          round(Quantities.jsonSafe(selfRatioRaw), 6).as("self_ratio"),
          round(Quantities.jsonSafe(negRatioRaw), 6).as("neg_ratio"))
          .orderBy("l_orderkey", "l_linenumber")
      }),

    Q(
      "f15_json_expand",
      """F15: JSON-string column expansion with prefixed flatten
        |(main.py:128-150) over events.props, then a grouped rollup on the
        |extracted field — parse happens inside scan codegen, no UDF.""".stripMargin,
      Some(
        """SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS props_k,
          |       COUNT(*) AS n,
          |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM events
          |GROUP BY 1
          |ORDER BY props_k""".stripMargin),
      (s, dir) => {
        val expanded = JsonExpand.expand(
          Tables.events(s, dir), "props",
          StructType(Seq(StructField("k", IntegerType))))
        expanded.groupBy("props_k")
          .agg(count(lit(1)).as("n"), d(sum(dec(col("value")))).as("sum_value"))
          .orderBy("props_k")
      }))
}
