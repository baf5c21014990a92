package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.io.File

/** Oracle-checked STREAMING execution — §2.9 semantics proven through the
  * driver's DuckDB gate, not only through ScalaTest. The catalog query
  * runs a real Structured Streaming job (file source → watermark →
  * event-time tumbling agg → append-mode memory sink) over a
  * deterministic replay of the events table, so the one behavior batch
  * twins can never exhibit — LATE ROWS DROPPED BY THE WATERMARK — lands
  * as a green hash-compared row.
  *
  * Determinism contract (what makes an oracle possible at all):
  *  - replay order: micro-batch b = event_id % 4, one parquet file per
  *    batch, file mtimes strictly increasing, maxFilesPerTrigger=1 — the
  *    file source admits exactly one file per micro-batch in mtime order;
  *  - watermark algebra: Spark tracks max event time in integer
  *    MILLISECONDS (micros floored) and runs the TWO-watermark model
  *    (SPARK-40925, verified against the offset log here): in micro-batch
  *    b the EVICTION watermark is max-through-batch-(b-1) minus delay,
  *    while the LATE-EVENT filter uses the PREVIOUS batch's watermark —
  *    max-through-batch-(b-2) minus delay. A row is dropped iff its
  *    window END (ms) <= that late-event watermark; because the filter
  *    lags eviction by exactly one batch, a window evicted in batch b is
  *    shielded from re-creation in batch b+1 (its end is already <= the
  *    filter threshold), so append mode emits each window once: after
  *    the final no-data flush batch, every window with end <= global max
  *    - delay. The oracle reproduces exactly this integer arithmetic; no
  *    floats, no ties.
  *
  * Scale shape: batch files are written executor-side (no driver data
  * path); the streaming agg is the same windows×types-sized state as the
  * production pipeline; only the emitted window counts (result-sized)
  * land in the memory sink.
  */
object StreamingQueries {

  private val ReplayBatches = 4
  private val DelayMs = 1801000L // 1801 s: deliberately not a round half hour

  val qs: Seq[Q] = Seq(
    Q(
      "w_watermark_late_drop",
      """Event-time windowed count under a 1801-second watermark with late
        |data: the events table replays in 4 deterministic micro-batches
        |(batch = event_id % 4, so every batch after the first carries
        |heavily late rows), and the append-mode result proves exactly
        |which rows the watermark dropped and which windows finalized. The
        |DuckDB oracle recomputes Spark's two-watermark algebra in integer
        |milliseconds — kept iff window_end > the late-event watermark of
        |the row's batch (the PREVIOUS batch's watermark: max event time
        |through batch b-2, minus delay), emitted iff window_end <= final
        |watermark.""".stripMargin,
      Some(
        s"""WITH e AS (
           |  SELECT event_id % $ReplayBatches AS b,
           |         epoch_us(ts) // 1000 AS ts_ms,
           |         date_trunc('hour', ts) AS wstart
           |  FROM events WHERE ts IS NOT NULL),
           |wm AS (
           |  SELECT b,
           |         GREATEST(COALESCE(
           |           MAX(max_ms) OVER (ORDER BY b
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
           |           - $DelayMs, 0), 0) AS w_ms
           |  FROM (SELECT b, MAX(ts_ms) AS max_ms FROM e GROUP BY b)),
           |kept AS (
           |  SELECT e.wstart
           |  FROM e JOIN wm USING (b)
           |  WHERE epoch_us(e.wstart + INTERVAL 1 HOUR) // 1000 > wm.w_ms),
           |fin AS (SELECT MAX(ts_ms) - $DelayMs AS w_ms FROM e)
           |SELECT wstart AS window_start,
           |       wstart + INTERVAL 1 HOUR AS window_end,
           |       COUNT(*) AS n_events
           |FROM kept, fin
           |WHERE epoch_us(wstart + INTERVAL 1 HOUR) // 1000 <= fin.w_ms
           |GROUP BY wstart
           |ORDER BY window_start""".stripMargin),
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft-wmark").toFile
        val streamDir = new File(tmp, "in")
        streamDir.mkdirs()
        try {
          val ev = Tables.events(s, dir)
            .filter(col("ts").isNotNull)
            .select(col("event_id"), col("ts"))
          // one parquet file per replay batch, written executor-side;
          // strictly increasing mtimes fix the admission order
          (0 until ReplayBatches).foreach { b =>
            val stage = new File(tmp, s"stage$b")
            ev.filter(pmod(col("event_id"), lit(ReplayBatches)) === b)
              .coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
            val part = stage.listFiles()
              .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
              .getOrElse(sys.error(s"no part file for replay batch $b"))
            val target = new File(streamDir, f"batch-$b%03d.parquet")
            java.nio.file.Files.move(part.toPath, target.toPath)
            target.setLastModified(1600000000000L + b * 60000L)
          }
          val sinkName = "w_watermark_late_drop_sink"
          s.catalog.dropTempView(sinkName)
          val q = s.readStream
            .schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(streamDir.getAbsolutePath)
            .withWatermark("ts", s"${DelayMs / 1000} seconds")
            .groupBy(window(col("ts"), "1 hour"))
            .agg(count(lit(1)).as("n_events"))
            .writeStream
            .format("memory")
            .queryName(sinkName)
            .outputMode("append")
            .option("checkpointLocation", new File(tmp, "ckpt").getAbsolutePath)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          s.table(sinkName)
            .select(
              col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col("n_events"))
            .orderBy("window_start")
        } finally {
          org.apache.commons.io.FileUtils.deleteQuietly(tmp); ()
        }
      }))
}
