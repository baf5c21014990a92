package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Stream-stream event-time join (dispatch ⟕ confirmation within a
  * window): inner emits pairs as they match; left_outer emits the
  * unmatched dispatch with nulls once the watermark proves no
  * confirmation can still arrive — the retry feed. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Dispatch(unique_transaction_id: String, ts: Timestamp)
  case class Confirm(unique_transaction_id: String, cts: Timestamp, status: String)

  test("inner: confirmation within the window pairs, outside does not") {
    implicit val sqlCtx = spark.sqlContext
    val dIn = MemoryStream[Dispatch]
    val cIn = MemoryStream[Confirm]
    val q = MicroBatchPipeline.confirmationJoin(
      dIn.toDF(), cIn.toDF(), confirmWindow = "1 hour", lateness = "10 minutes")
      .writeStream.format("memory").queryName("confirmed").outputMode("append").start()
    try {
      dIn.addData(
        Dispatch("a", ts("2024-01-01 10:00:00")),
        Dispatch("b", ts("2024-01-01 10:00:00")))
      cIn.addData(
        Confirm("a", ts("2024-01-01 10:30:00"), "done"),   // inside window
        Confirm("b", ts("2024-01-01 12:00:00"), "done"))   // outside window
      q.processAllAvailable()
      val out = spark.table("confirmed")
        .select("unique_transaction_id", "status").as[(String, String)].collect().toSeq
      assert(out === Seq(("a", "done")))
    } finally q.stop()
  }

  test("left_outer: unmatched dispatch emits with nulls after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val dIn = MemoryStream[Dispatch]
    val cIn = MemoryStream[Confirm]
    val q = MicroBatchPipeline.confirmationJoin(
      dIn.toDF(), cIn.toDF(), confirmWindow = "1 hour", lateness = "10 minutes",
      joinType = "left_outer")
      .writeStream.format("memory").queryName("retry_feed").outputMode("append").start()
    try {
      dIn.addData(Dispatch("lost", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("retry_feed").count() === 0) // still inside the window

      // push both watermarks far past 11:10 (= ts + window + lateness)
      dIn.addData(Dispatch("later", ts("2024-01-01 13:00:00")))
      cIn.addData(Confirm("later", ts("2024-01-01 13:01:00"), "done"))
      q.processAllAvailable()
      dIn.addData(Dispatch("later2", ts("2024-01-01 14:00:00")))
      cIn.addData(Confirm("later2", ts("2024-01-01 14:01:00"), "done"))
      q.processAllAvailable()

      val unmatched = spark.table("retry_feed")
        .filter("status IS NULL")
        .select("unique_transaction_id").as[String].collect().toSeq
      assert(unmatched === Seq("lost"))
    } finally q.stop()
  }
}
