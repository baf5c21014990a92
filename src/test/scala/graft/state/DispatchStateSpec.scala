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
}
