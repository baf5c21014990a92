package graft.sources.rest

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DataSourceV2 REST-API model: pushdown of equality/date-bound
  * filters into "query params", column pruning, page-level partition
  * pruning, and agreement with the unpushed computation. */
class RestCardexSourceSpec extends SparkSpec {

  private def src: DataFrame = spark.read
    .format("graft.sources.rest.RestCardexSource")
    .option("pages", 6).option("rowsPerPage", 300)
    .load()

  private def scanOf(df: DataFrame): CardexScan =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.asInstanceOf[CardexScan]
    }.head

  test("filters push into query params; page pruning skips early pages") {
    val filtered = src.filter(col("bu") === "1120" && col("r_date") >= lit("2024-01-05"))
    val desc = scanOf(filtered).description()
    assert(desc.contains("bu=Some(1120)"), desc)
    assert(desc.contains("minDate=Some("), desc)
    // pages 0-1 cover 2024-01-01..04 -> pruned; 4 of 6 pages remain
    assert(scanOf(filtered).planInputPartitions().length === 4)
    // results agree with the same predicate evaluated engine-side
    val unpushed = src.collect().filter { r =>
      r.getAs[String]("bu") == "1120" &&
        !r.getAs[java.sql.Date]("r_date").toLocalDate.isBefore(java.time.LocalDate.parse("2024-01-05"))
    }
    assert(filtered.count() === unpushed.length)
  }

  test("column pruning reaches the reader") {
    val pruned = src.select("item", "qty")
    assert(scanOf(pruned).readSchema().fieldNames.toSeq === Seq("item", "qty"))
    assert(pruned.distinct().count() > 0)
  }

  test("partitions parallelize by page") {
    assert(scanOf(src).planInputPartitions().length === 6)
    assert(src.rdd.getNumPartitions === 6)
    assert(src.count() === 6 * 300)
  }

  test("limit pushes to the reader (the reference's size= cap) and stays correct") {
    val limited = src.limit(5)
    val desc = scanOf(limited).description()
    assert(desc.contains("limit=Some(5)"), desc)
    // pushLimit returns false (partial push): Spark still applies its own
    // limit, so the result is exact even though every partition may
    // produce up to 5 rows
    assert(limited.count() === 5)
  }

  // --- retry / backoff / rate-limit modeling (reference
  // backend/utility.py:382-400, backend/bakery_ops_helper.py:277-281) ---

  private def srcWith(runId: String, failPlan: String): DataFrame = {
    FakeCardexApi.resetRun(runId)
    spark.read
      .format("graft.sources.rest.RestCardexSource")
      .option("pages", 3).option("rowsPerPage", 100)
      .option("apiRunId", runId).option("failPlan", failPlan)
      .option("baseDelayMs", 5)
      .load()
  }

  test("transient failures recover with an exponential backoff ladder") {
    val df = srcWith("t-transient", "1:transient:2")
    // no rows lost: the failing page retries to success
    assert(df.count() === 300)
    // 2 failures + 1 success = 3 fetch attempts on page 1
    assert(FakeCardexApi.attempts("t-transient", 1) === 3)
    // backoff doubles: base, 2*base
    assert(FakeCardexApi.sleepLog("t-transient") === Seq((1, 5L), (1, 10L)))
  }

  test("rate limit honors the server's wait hint") {
    val df = srcWith("t-rate-hint", "2:rate:57")
    assert(df.count() === 300)
    assert(FakeCardexApi.sleepLog("t-rate-hint") === Seq((2, 57L)))
  }

  test("rate limit without a hint falls back to the default wait") {
    val df = srcWith("t-rate-nohint", "0:rate")
    assert(df.count() === 300)
    // defaultRateWaitMs default = 10 (the reference's 10 s, scaled to ms)
    assert(FakeCardexApi.sleepLog("t-rate-nohint") === Seq((0, 10L)))
  }

  test("retries cap at 3: a page failing 4 times fails the task, not silently") {
    val df = srcWith("t-cap", "1:transient:4")
    val e = intercept[org.apache.spark.SparkException](df.count())
    assert(e.getMessage.contains("transient") ||
      Option(e.getCause).exists(_.toString.contains("transient")), e.toString)
    // 1 initial + 3 retries = 4 attempts, then give up
    assert(FakeCardexApi.attempts("t-cap", 1) === 4)
  }

  test("a poisoned page fails the read outright (no silent data loss)") {
    val df = srcWith("t-poison", "2:poison")
    intercept[org.apache.spark.SparkException](df.count())
    // a pushed lower bound prunes the poisoned early page server-side —
    // the query never fetches it, so it succeeds (and the poison plan
    // never touches sibling pages)
    val pruned = srcWith("t-poison-2", "0:poison").filter(col("r_date") >= lit("2024-01-03"))
    assert(pruned.count() === 200)
  }
}
