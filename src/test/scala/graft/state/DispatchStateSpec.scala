package graft.state

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** K4/J5 exactly-once dispatch state: pending gate, latest-wins upsert,
  * idempotence across re-runs (the overlapping-lookback scenario the
  * reference's Airflow DAGs hit every cycle). */
class DispatchStateSpec extends SparkSpec {
  import spark.implicits._

  private def recs(ids: String*) =
    ids.toDF("unique_transaction_id").withColumn("payload", lit("x"))

  private def status(rows: (String, String, String)*) =
    rows.toDF("unique_transaction_id", "status", "ts")
      .select(col("unique_transaction_id"), col("status"),
        lit("d").as("detail"), col("ts").cast("timestamp").as("updated_at"))

  test("empty state: everything pending; upsert then gates") {
    val dir = Files.createTempDirectory("state").toString
    assert(DispatchState.pending(recs("a", "b"), spark, dir).count() === 2)

    DispatchState.upsert(spark, dir, status(("a", "done", "2024-01-01 00:00:00")))
    val p = DispatchState.pending(recs("a", "b"), spark, dir)
    assert(p.select("unique_transaction_id").as[String].collect().toSeq === Seq("b"))
  }

  test("latest wins per key; error does not gate; re-run is idempotent") {
    val dir = Files.createTempDirectory("state").toString
    // first attempt errored, retry succeeded later
    DispatchState.upsert(spark, dir, status(
      ("a", "error", "2024-01-01 00:00:00"),
      ("b", "error", "2024-01-01 00:00:00")))
    DispatchState.upsert(spark, dir, status(("a", "done", "2024-01-02 00:00:00")))

    val state = DispatchState.read(spark, dir)
      .select("unique_transaction_id", "status").as[(String, String)].collect().toMap
    assert(state === Map("a" -> "done", "b" -> "error"))

    // a is gated (done); b errored so it re-dispatches
    val p = DispatchState.pending(recs("a", "b", "c"), spark, dir)
    assert(p.select("unique_transaction_id").as[String].collect().sorted.toSeq === Seq("b", "c"))

    // replaying the same done-update changes nothing (exactly-once across
    // overlapping lookback windows)
    DispatchState.upsert(spark, dir, status(("a", "done", "2024-01-02 00:00:00")))
    assert(DispatchState.read(spark, dir).count() === 2)
  }

  test("done beats error at identical timestamp (ON CONFLICT DO UPDATE semantics)") {
    val dir = Files.createTempDirectory("state").toString
    DispatchState.upsert(spark, dir, status(
      ("k", "error", "2024-01-01 00:00:00"),
      ("k", "done", "2024-01-01 00:00:00")))
    assert(DispatchState.read(spark, dir).select("status").as[String].collect().toSeq === Seq("done"))
  }

  test("crash recovery: lost pointer falls back to highest complete version") {
    val dir = Files.createTempDirectory("state").toString
    DispatchState.upsert(spark, dir, status(("a", "done", "2024-01-01 00:00:00")))
    DispatchState.upsert(spark, dir, status(("b", "done", "2024-01-02 00:00:00")))
    // simulate a crash that corrupted/dropped the pointer after publish
    assert(new java.io.File(s"$dir/CURRENT").delete())
    val state = DispatchState.read(spark, dir)
      .select("unique_transaction_id").as[String].collect().sorted.toSeq
    assert(state === Seq("a", "b"))
  }

  test("crash recovery: half-written next version (no _SUCCESS) is ignored") {
    val dir = Files.createTempDirectory("state").toString
    DispatchState.upsert(spark, dir, status(("a", "done", "2024-01-01 00:00:00")))
    // simulate a writer that died mid-write: v-2 exists but never committed
    val half = new java.io.File(s"$dir/v-2")
    assert(half.mkdirs())
    Files.write(half.toPath.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    assert(DispatchState.read(spark, dir).count() === 1) // still v-1
    // and the next upsert recovers by publishing over/past the junk
    DispatchState.upsert(spark, dir, status(("b", "done", "2024-01-02 00:00:00")))
    assert(DispatchState.read(spark, dir).count() === 2)
  }

  test("legacy {dir}/current layout is read and folded into v-1 on upsert") {
    val dir = Files.createTempDirectory("state").toString
    // state written by the previous delete-and-rename layout
    status(("old-a", "done", "2024-01-01 00:00:00"))
      .write.parquet(s"$dir/current")
    // read() must see the legacy table, not an empty one (else every
    // historical record would re-dispatch)
    assert(DispatchState.pending(recs("old-a", "new-b"), spark, dir)
      .select("unique_transaction_id").as[String].collect().toSeq === Seq("new-b"))
    // the next upsert migrates legacy + new into the versioned layout
    DispatchState.upsert(spark, dir, status(("new-b", "done", "2024-01-02 00:00:00")))
    assert(new java.io.File(s"$dir/v-1").exists())
    val state = DispatchState.read(spark, dir)
      .select("unique_transaction_id").as[String].collect().sorted.toSeq
    assert(state === Seq("new-b", "old-a"))
  }

  test("old versions pruned but the immediate predecessor is retained") {
    val dir = Files.createTempDirectory("state").toString
    (1 to 4).foreach { i =>
      DispatchState.upsert(spark, dir, status((s"k$i", "done", f"2024-01-0$i 00:00:00")))
    }
    val versions = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v-")).map(_.getName).sorted.toSeq
    assert(versions === Seq("v-3", "v-4"))
    assert(DispatchState.read(spark, dir).count() === 4)
  }
}
