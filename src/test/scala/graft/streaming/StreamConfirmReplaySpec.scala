package graft.streaming

import graft.SparkSpec
import graft.queries.Catalog
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** j_stream_confirm_replay claims the watermarked stream-stream range
  * join, fed in event-time order, emits EXACTLY the batch join's answer.
  * The DuckDB oracle proves it against SQL; this spec proves it against
  * Spark's own batch join (engine-internal equivalence) and that the
  * replay is deterministic.
  */
class StreamConfirmReplaySpec extends SparkSpec {

  test("streaming range join over in-order replay equals Spark's batch join") {
    val streaming = Catalog.byName("j_stream_confirm_replay")
      .build(spark, sfSmoke).collect().toSeq
    val ev = Tables.events(spark, sfSmoke).filter(col("ts").isNotNull)
    val a = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("a_id"), col("user_id"), col("ts"))
    val b = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("ts").as("cts"))
    val batch = a.join(b,
      col("user_id") === col("b_user") &&
        col("cts") >= col("ts") &&
        col("cts") <= col("ts") + expr("INTERVAL 1 DAY"))
      .select("a_id", "b_id", "user_id", "ts", "cts")
      .orderBy("a_id", "b_id").collect().toSeq
    assert(streaming.nonEmpty)
    assert(streaming === batch,
      "watermarked stream-stream join dropped or invented pairs vs batch")
  }

  test("deterministic replay: two runs emit identical pair sets") {
    def run() = Catalog.byName("j_stream_confirm_replay")
      .build(spark, sfSmoke).collect().toSeq
    assert(run() === run())
  }

  test("session replay withholds exactly the tail sessions the watermark cannot close") {
    val out = Catalog.byName("w_session_replay").build(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    // every user's last session ends within gap of the final watermark or
    // later — the emitted set must therefore be strictly smaller than the
    // total session count (at least one open tail per active-at-end user)
    val users = out.map(_.getLong(0)).distinct.length
    val ev = Tables.events(spark, sfSmoke).filter(col("ts").isNotNull)
    val totalUsers = ev.select("user_id").distinct().count()
    assert(users.toLong <= totalUsers)
    assert(out.length < ev.count(), "session count cannot reach event count")
  }

  test("dedup replay absorbs every injected duplicate") {
    val out = Catalog.byName("w_stream_dedup_replay").build(spark, sfSmoke).collect()
    val counted = out.map(_.getLong(2)).sum
    val ev = Tables.events(spark, sfSmoke).filter(col("ts").isNotNull)
    // emitted counts can never exceed the distinct event count even
    // though a third of the feed was duplicated
    assert(counted <= ev.select("event_id").distinct().count())
    assert(counted > 0)
  }
}
