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
}
