package graft.streaming

import graft.SparkSpec
import graft.queries.Catalog
import org.apache.spark.sql.functions._

/** The w_watermark_late_drop catalog query runs a REAL Structured
  * Streaming job (file-source replay, watermark, append-mode windowed
  * agg); the DuckDB oracle is the driver's proof of its values. This spec
  * pins the streaming-semantics claims the oracle compare alone doesn't
  * state explicitly.
  */
class WatermarkLateDropSpec extends SparkSpec {

  private def run() =
    Catalog.byName("w_watermark_late_drop").build(spark, sfSmoke)
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))

  test("late rows beyond the watermark are provably dropped") {
    val out = run()
    val kept = out.map(_._3).sum
    val total = graft.sources.Tables.events(spark, sfSmoke)
      .filter(col("ts").isNotNull).count()
    // replay batch 1 arrives before any watermark is set (the late filter
    // lags eviction by one batch), batches 2-3 land almost entirely
    // behind it: the drop must be real and large, never zero
    assert(kept < total, s"no late rows dropped ($kept of $total kept)")
    assert(kept <= (total * 2) / 4 + total / 100,
      s"late filter kept $kept of $total — more than ~2 replay batches")
    assert(kept > total / 4, s"late filter dropped on-time rows ($kept of $total)")
  }

  test("append mode emits each finalized window exactly once, none open") {
    val out = run()
    val windows = out.map(w => (w._1, w._2))
    assert(windows.distinct.length === windows.length, "window emitted twice")
    // the stream's final watermark withholds the last (still-open) window:
    // no emitted window may end beyond global max event time minus delay
    val maxMs = graft.sources.Tables.events(spark, sfSmoke)
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) / 1000
    val finalW = maxMs - 1801000L
    assert(out.forall(_._2.getTime <= finalW),
      "emitted a window the final watermark had not finalized")
  }

  test("deterministic replay: two full streaming runs produce identical output") {
    assert(run().toSeq === run().toSeq)
  }
}
