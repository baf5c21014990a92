package graft.streaming

import graft.SparkSpec
import graft.streaming.MicroBatchPipeline.{Adjustment, OnHand}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** K7/A5 streaming state: running on-hand across micro-batches with the
  * clamp-at-zero semantics, state carried between batches per product. */
class RunningOnHandSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("on-hand accumulates across batches, USAGE decrements, clamps at 0") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Adjustment]
    val q = MicroBatchPipeline.runningOnHand(input.toDS())
      .writeStream.format("memory").queryName("onhand").outputMode(OutputMode.Update()).start()
    try {
      // batch 1: receive 10, use 3 -> 7
      input.addData(
        Adjustment(1L, "RECEIPT", 10.0, ts("2024-01-01 10:00:00")),
        Adjustment(1L, "USAGE", 3.0, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      val b1 = spark.table("onhand").as[OnHand].collect().last
      assert(b1 === OnHand(1L, 7.0, 2L))

      // batch 2: state persists; over-usage clamps to 0 (main.py:1777 max(0,...))
      input.addData(Adjustment(1L, "USAGE", 100.0, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val rows = spark.table("onhand").as[OnHand].collect()
      assert(rows.filter(_.nAdjustments == 3).head === OnHand(1L, 0.0, 3L))

      // independent keys don't interact
      input.addData(Adjustment(2L, "RECEIPT", 5.0, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      assert(spark.table("onhand").as[OnHand].collect()
        .exists(o => o.productId == 2L && o.amount == 5.0))
    } finally q.stop()
  }
}
