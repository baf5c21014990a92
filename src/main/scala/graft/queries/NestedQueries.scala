package graft.queries

import graft.functions.Num
import graft.ops.ActionFlattener
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Nested-document construction + generator flatten (SURVEY.md §1.1 deep
  * event documents, §2.8 generator shape) and the event-time windowed
  * aggregation capability (§2.9 — an extension; the reference only has
  * lookback polling).
  */
object NestedQueries {
  import Num.{d, dec}

  val qs: Seq[Q] = Seq(
    Q(
      "nested_flatten_actions",
      """Round-trip of the reference's deepest data shape: build nested
        |action documents (order -> ingredients[] -> batches[] + vessel
        |additions map) from the flat tables, then flatten with the
        |explode/map_entries chain — preserving the reference's inflation
        |quirk (full ingredient qty on every batch row,
        |bakery_helper.py:524-526). The oracle derives the same rows
        |directly from the flat side, so the compare proves construction
        |and flatten are exact inverses. Generators run in the scan stage;
        |the only shuffle is the collect_list build.""".stripMargin,
      Some(
        """SELECT l.l_orderkey AS action_id,
          |       l.l_partkey AS ingredient_id,
          |       concat('item', CAST(l.l_partkey AS VARCHAR)) AS ingredient_name,
          |       concat('B', CAST(l.l_linenumber AS VARCHAR), '_', CAST(t.b AS VARCHAR)) AS batch_number,
          |       concat('L', CAST(t.b AS VARCHAR)) AS lot,
          |       concat('V', CAST(l.l_suppkey % 3 AS VARCHAR)) AS vessel,
          |       l.l_quantity AS qty
          |FROM lineitem l,
          |     LATERAL (SELECT unnest(range(1, CAST(2 + l.l_linenumber % 2 AS BIGINT))) AS b) t
          |ORDER BY action_id, ingredient_id, batch_number, vessel, qty""".stripMargin),
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        // batches: 1 or 2 per line depending on parity of l_linenumber
        val batches = when(pmod(col("l_linenumber"), lit(2)) === 1,
          array(
            struct(concat(lit("B"), col("l_linenumber"), lit("_1")).as("batch_number"),
              lit("L1").as("lot")),
            struct(concat(lit("B"), col("l_linenumber"), lit("_2")).as("batch_number"),
              lit("L2").as("lot"))))
          .otherwise(array(
            struct(concat(lit("B"), col("l_linenumber"), lit("_1")).as("batch_number"),
              lit("L1").as("lot"))))
        val ingredient = struct(
          col("l_partkey").as("ingredient_id"),
          concat(lit("item"), col("l_partkey")).as("name"),
          col("l_quantity").as("qty"),
          batches.as("batches"),
          map(concat(lit("V"), pmod(col("l_suppkey"), lit(3))), col("l_quantity")).as("additions"))
        val actions = li
          .select(col("l_orderkey").as("action_id"), ingredient.as("ing"))
          .groupBy("action_id")
          .agg(collect_list(col("ing")).as("ingredients"))
        ActionFlattener.flatten(actions)
          .orderBy("action_id", "ingredient_id", "batch_number", "vessel", "qty")
      }),

    Q(
      "w_tumbling_hourly",
      """Event-time tumbling-window aggregation (the Structured-Streaming
        |windowed agg in its batch form — same window() expression the
        |streaming pipeline uses): hourly counts and exact sums per event
        |type. Map-side partial agg; shuffle sized by windows x types.""".stripMargin,
      Some(
        """SELECT date_trunc('hour', ts) AS window_start,
          |       event_type,
          |       COUNT(*) AS n,
          |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM events
          |GROUP BY 1, 2
          |ORDER BY window_start, event_type""".stripMargin),
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), d(sum(dec(col("value")))).as("sum_value"))
          .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
          .orderBy("window_start", "event_type")))
}
