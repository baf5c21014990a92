package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import java.nio.file.Files

/** Checkpointed file-stream recovery: a stopped query restarted from its
  * checkpoint processes ONLY data that arrived while it was down — the
  * cross-restart exactly-once the reference approximated with lookback
  * windows and status tables (§2.9). */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("restart from checkpoint neither loses nor reprocesses batches") {
    val srcDir = Files.createTempDirectory("stream-src").toString
    val outDir = Files.createTempDirectory("stream-out").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val schema = StructType.fromDDL("id BIGINT, qty DOUBLE")

    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, i * 1.5)).toDF("id", "qty")
        .coalesce(1).write.mode("append").parquet(srcDir)

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .withColumn("doubled", col("qty") * 2)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeBatch(0 until 100)
    runOnce()
    assert(spark.read.parquet(outDir).count() === 100)

    // down-time arrivals
    writeBatch(100 until 150)
    runOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() === 150) // 50 new, 100 NOT reprocessed
    assert(out.select(countDistinct(col("id"))).as[Long].collect().head === 150)

    // restart with nothing new: no-op
    runOnce()
    assert(spark.read.parquet(outDir).count() === 150)
  }
}
