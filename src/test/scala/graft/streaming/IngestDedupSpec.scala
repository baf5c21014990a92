package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.state.KeyIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** JVM-singleton capture (see [[DispatchCapture]] for why). */
object IngestCapture {
  val docs = new ConcurrentLinkedQueue[Long]()
}

/** Streaming incremental corpus ingest: in-batch dedup (first doc_id per
  * content key), cross-batch dedup via the persistent KeyIndex, and
  * idempotent replay — the stateful twin of the `dd_incremental` catalog
  * query. */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, text: String)

  test("dedups within a batch, across batches, and survives replay") {
    implicit val sqlCtx = spark.sqlContext
    val indexDir = Files.createTempDirectory("key-index").toString
    IngestCapture.docs.clear()
    val input = MemoryStream[Doc]
    val q = MicroBatchPipeline.ingestDedupStream(
      input.toDF(), indexDir,
      fresh => fresh.select("doc_id").collect()
        .foreach(r => IngestCapture.docs.add(r.getLong(0)))).start()
    try {
      // batch 1: docs 2 and 1 share a content key (same token set,
      // different order) -> doc 1 wins in-batch; doc 3 is unique
      input.addData(
        Doc(2, "fast table scan"),
        Doc(1, "scan table fast"),
        Doc(3, "merge join plan"))
      q.processAllAvailable()
      assert(IngestCapture.docs.toArray.toSet === Set(1L, 3L))

      // batch 2: doc 4 repeats batch-1 content (dup_history, dropped);
      // doc 5 is genuinely new
      input.addData(
        Doc(4, "fast table scan"),
        Doc(5, "hash group agg"))
      q.processAllAvailable()
      assert(IngestCapture.docs.toArray.toSet === Set(1L, 3L, 5L))

      // index holds exactly the three distinct keys, first-writer-wins
      val idx = KeyIndex.read(spark, indexDir)
        .as[(String, Long)].collect().toMap
      assert(idx.size === 3)
      assert(idx.values.toSet === Set(0L, 1L))
    } finally q.stop()

    // replay batch-2 content against the SAME index (crash-replay shape):
    // everything is already indexed, so nothing survives and the index
    // keeps its original first_batch stamps
    IngestCapture.docs.clear()
    val replay = MemoryStream[Doc](
      implicitly[org.apache.spark.sql.Encoder[Doc]], spark.sqlContext)
    val q2 = MicroBatchPipeline.ingestDedupStream(
      replay.toDF(), indexDir,
      fresh => fresh.select("doc_id").collect()
        .foreach(r => IngestCapture.docs.add(r.getLong(0)))).start()
    try {
      replay.addData(Doc(4, "fast table scan"), Doc(5, "hash group agg"))
      q2.processAllAvailable()
      assert(IngestCapture.docs.isEmpty)
      assert(KeyIndex.read(spark, indexDir).count() === 3)
    } finally q2.stop()
  }
}
