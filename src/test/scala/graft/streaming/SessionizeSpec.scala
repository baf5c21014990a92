package graft.streaming

import graft.SparkSpec
import graft.streaming.MicroBatchPipeline.{SessionEvent, UserSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp
import scala.concurrent.duration._

/** Gap-based sessionization: events within the gap merge into one session,
  * a larger gap (within one batch) closes the session and emits it. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("in-batch gap closes a session; open session stays in state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = MicroBatchPipeline.sessionize(input.toDS(), 30.minutes)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      input.addData(
        SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        SessionEvent(1L, ts("2024-01-01 10:10:00"), 2.0), // same session
        SessionEvent(1L, ts("2024-01-01 12:00:00"), 5.0), // >30min gap: closes first
        SessionEvent(2L, ts("2024-01-01 10:00:00"), 9.0)) // other key, stays open
      q.processAllAvailable()
      val out = spark.table("sessions").as[UserSession].collect().toSeq
      assert(out === Seq(UserSession(1L,
        ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L, 3.0)))

      // next batch continues user 1's open session within the gap
      input.addData(SessionEvent(1L, ts("2024-01-01 12:20:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 1) // still only the closed one
    } finally q.stop()
  }

  test("a late event in a later micro-batch never regresses session bounds") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = MicroBatchPipeline.sessionize(input.toDS(), 30.minutes)
      .writeStream.format("memory").queryName("late_sessions").outputMode("append").start()
    try {
      input.addData(
        SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        SessionEvent(1L, ts("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      // batch 2: an out-of-order event INSIDE the open session
      input.addData(SessionEvent(1L, ts("2024-01-01 10:05:00"), 4.0))
      q.processAllAvailable()
      // 10:38 is within the gap of the TRUE end (10:10), so it must
      // extend the session, not close it against a regressed 10:05 end
      input.addData(SessionEvent(1L, ts("2024-01-01 10:38:00"), 8.0))
      q.processAllAvailable()
      assert(spark.table("late_sessions").count() === 0) // still one open session
      // a real gap closes it with the correct bounds and all 4 events
      input.addData(SessionEvent(1L, ts("2024-01-01 13:00:00"), 0.5))
      q.processAllAvailable()
      val out = spark.table("late_sessions").as[UserSession].collect().toSeq
      assert(out === Seq(UserSession(1L,
        ts("2024-01-01 10:00:00"), ts("2024-01-01 10:38:00"), 4L, 15.0)))
    } finally q.stop()
  }

  test("event-time timeout closes idle sessions once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // gap 30 min, watermark lateness 10 min
    val q = MicroBatchPipeline.sessionizeExpiring(input.toDS(), 30.minutes, "10 minutes")
      .writeStream.format("memory").queryName("exp_sessions").outputMode("append").start()
    try {
      input.addData(
        SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        SessionEvent(1L, ts("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      // watermark is still behind 10:40 (= 10:10 end + 30 min gap): open
      assert(spark.table("exp_sessions").count() === 0)

      // another user's later events push the watermark to 11:50 > 10:40
      input.addData(SessionEvent(2L, ts("2024-01-01 12:00:00"), 9.0))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, ts("2024-01-01 12:01:00"), 1.0))
      q.processAllAvailable()

      val out = spark.table("exp_sessions").as[UserSession].collect().toSeq
      assert(out === Seq(UserSession(1L,
        ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L, 3.0)))
    } finally q.stop()
  }
}
