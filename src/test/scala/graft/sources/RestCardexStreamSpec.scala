package graft.sources

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.sources.rest.FakeCardexApi
import org.apache.spark.sql.DataFrame

/** JVM-singleton capture (task closures serialize; a static object
  * resolves to the same instance on deserialization). */
object CardexStreamCapture {
  val rows = new ConcurrentLinkedQueue[(String, Int)]() // (item, r_date)
}

/** The REST source in streaming mode (MICRO_BATCH_READ): offsets are
  * published pages, each trigger consumes exactly the new ones, and the
  * checkpointed offset log carries exactly-once across a query restart —
  * the engine analog of the reference's poll-every-N-minutes DAGs plus
  * their hand-rolled "what did I already fetch" bookkeeping. foreachBatch
  * sink because it supports checkpoint recovery (memory sink does not). */
class RestCardexStreamSpec extends SparkSpec {

  private def startQuery(run: String, ckpt: String, extra: Map[String, String] = Map.empty) = {
    var reader = spark.readStream
      .format("graft.sources.rest.RestCardexSource")
      .option("rowsPerPage", 10)
      .option("apiRunId", run)
    extra.foreach { case (k, v) => reader = reader.option(k, v) }
    reader.load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("item", "r_date").collect().foreach(r =>
          CardexStreamCapture.rows.add(
            (r.getString(0), r.getDate(1).toLocalDate.toEpochDay.toInt)))
      }
      .start()
  }

  test("incremental pages, no re-fetch, exactly-once across restart") {
    val run = "stream-1"
    FakeCardexApi.resetRun(run)
    CardexStreamCapture.rows.clear()
    FakeCardexApi.publishPages(run, 2)
    val ckpt = Files.createTempDirectory("cardex-ckpt").toString

    val q1 = startQuery(run, ckpt)
    try {
      q1.processAllAvailable()
      assert(CardexStreamCapture.rows.size === 20) // pages 0,1
      // two more pages appear server-side; only they are fetched
      FakeCardexApi.publishPages(run, 4)
      q1.processAllAvailable()
      assert(CardexStreamCapture.rows.size === 40)
      (0 until 4).foreach { p =>
        assert(FakeCardexApi.attempts(run, p) === 1,
          s"page $p fetched ${FakeCardexApi.attempts(run, p)} times")
      }
    } finally q1.stop()

    // restart against the SAME checkpoint: the offset log says all four
    // pages are consumed, so nothing is re-fetched and nothing re-emits
    val q2 = startQuery(run, ckpt)
    try {
      q2.processAllAvailable()
      assert(CardexStreamCapture.rows.size === 40)
      (0 until 4).foreach(p => assert(FakeCardexApi.attempts(run, p) === 1))
      // new data after the restart flows normally
      FakeCardexApi.publishPages(run, 5)
      q2.processAllAvailable()
      assert(CardexStreamCapture.rows.size === 50)
      assert(FakeCardexApi.attempts(run, 4) === 1)
    } finally q2.stop()
  }

  test("maxPagesPerTrigger bounds each micro-batch yet the stream drains fully") {
    val run = "stream-cap"
    FakeCardexApi.resetRun(run)
    CardexStreamCapture.rows.clear()
    FakeCardexApi.publishPages(run, 5)
    val ckpt = Files.createTempDirectory("cardex-ckpt").toString
    val batchSizes = new ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .format("graft.sources.rest.RestCardexSource")
      .option("rowsPerPage", 10)
      .option("apiRunId", run)
      .option("maxPagesPerTrigger", 2)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batchSizes.add(batch.count()); ()
      }
      .start()
    try {
      q.processAllAvailable()
      // 5 pages at cap 2 -> micro-batches of 2+2+1 pages, all consumed
      val sizes = batchSizes.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
      assert(sizes.sum === 50, s"sizes=$sizes")
      assert(sizes.forall(_ <= 20), s"a batch exceeded the 2-page cap: $sizes")
      assert(sizes.length >= 3, s"cap not applied (one giant batch): $sizes")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the published pages and terminates") {
    val run = "stream-avail"
    FakeCardexApi.resetRun(run)
    CardexStreamCapture.rows.clear()
    FakeCardexApi.publishPages(run, 3)
    val ckpt = Files.createTempDirectory("cardex-ckpt").toString
    val q = spark.readStream
      .format("graft.sources.rest.RestCardexSource")
      .option("rowsPerPage", 10)
      .option("apiRunId", run)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("item", "r_date").collect().foreach(r =>
          CardexStreamCapture.rows.add(
            (r.getString(0), r.getDate(1).toLocalDate.toEpochDay.toInt)))
      }
      .start()
    // the catch-up batch drains pages 0-2 and STOPS on its own
    assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
    assert(CardexStreamCapture.rows.size === 30)
    (0 until 3).foreach(p => assert(FakeCardexApi.attempts(run, p) === 1))
  }

  test("streaming fetches retry transients like batch (shared client path)") {
    val run = "stream-retry"
    FakeCardexApi.resetRun(run)
    CardexStreamCapture.rows.clear()
    FakeCardexApi.publishPages(run, 1)
    val ckpt = Files.createTempDirectory("cardex-ckpt").toString
    val q = startQuery(run, ckpt,
      Map("failPlan" -> "0:transient:2", "baseDelayMs" -> "1"))
    try {
      q.processAllAvailable()
      assert(CardexStreamCapture.rows.size === 10)
      // 2 failed attempts + 1 success, with the exponential ladder logged
      assert(FakeCardexApi.attempts(run, 0) === 3)
      assert(FakeCardexApi.sleepLog(run).map(_._2) === Seq(1L, 2L))
    } finally q.stop()
  }
}
