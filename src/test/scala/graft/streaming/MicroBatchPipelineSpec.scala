package graft.streaming

import graft.SparkSpec
import graft.state.DispatchState
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

/** JVM-singleton capture: task closures are serialized even in local mode,
  * so a queue captured by value would be mutated on a copy. A static
  * object resolves to the same instance on deserialization. */
object DispatchCapture {
  val ids = new ConcurrentLinkedQueue[String]()
}

/** §2.9 streaming semantics: watermark dedup, windowed aggregation, and the
  * exactly-once dispatch loop across micro-batches (the Airflow-DAG
  * behavior re-expressed as Structured Streaming). */
class MicroBatchPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class Rec(name: String, lot: String, vessel: String, qty: Double, ts: Timestamp)

  test("windowed counts with in-stream duplicate drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = MicroBatchPipeline.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:05:00"), "purchase", 10.0),
        Ev(1, ts("2024-01-01 10:05:00"), "purchase", 10.0), // dup event_id
        Ev(2, ts("2024-01-01 10:40:00"), "purchase", 5.0),
        Ev(3, ts("2024-01-01 11:10:00"), "error", 1.0))
      q.processAllAvailable()
      val out = spark.table("wc")
        .select("window_start", "event_type", "n", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(out === Set(
        (ts("2024-01-01 10:00:00"), "purchase", 2L, 15.0),
        (ts("2024-01-01 11:00:00"), "error", 1L, 1.0)))
    } finally q.stop()
  }

  test("dispatch stream: exactly-once across micro-batches and overlapping replays") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = Files.createTempDirectory("dispatch-state").toString
    val dispatched = DispatchCapture.ids
    dispatched.clear()
    val input = MemoryStream[Rec]
    val writer = MicroBatchPipeline.dispatchStream(
      input.toDF(), stateDir,
      rows => rows.foreach(r => DispatchCapture.ids.add(
        r.getAs[String]("unique_transaction_id"))))
    val q = writer.start()
    try {
      input.addData(
        Rec("Flour", "L1", "V1", 2.5, ts("2024-01-01 10:00:00")),
        Rec("Flour", "L1", "V1", 2.5, ts("2024-01-01 10:00:00")), // in-batch dup
        Rec("Sugar", "L2", "V1", 1.0, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      assert(dispatched.size() === 2)
      assert(dispatched.toArray.toSet === Set("Flour_L1_V1_2.5", "Sugar_L2_V1_1"))

      // overlapping lookback replay: same records re-arrive (new event ids,
      // same business identity) -> state gate stops re-dispatch
      input.addData(
        Rec("Flour", "L1", "V1", 2.5, ts("2024-01-01 10:00:00")),
        Rec("Butter", "L9", "V2", 3.0, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(dispatched.size() === 3) // only Butter added
      val state = DispatchState.read(spark, stateDir)
      assert(state.filter(col("status") === "done").count() === 3)
    } finally q.stop()
  }
}
