package graft.engine

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Approximate aggregates (capability extension, SURVEY.md §2.5 notes the
  * reference has none): HLL distinct counts and approximate quantiles.
  * No cross-engine oracle exists (sketch algorithms differ), so these pin
  * error bounds against the exact computation instead. */
class ApproxAggSpec extends SparkSpec {

  test("approx_count_distinct within rsd of exact") {
    val df = Tables.lineitem(spark, sfSmoke)
    val Array(exact, approx) = df.agg(
      countDistinct(col("l_partkey")).cast("double"),
      approx_count_distinct(col("l_partkey"), rsd = 0.05).cast("double"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(approx - exact) / exact <= 0.15, s"approx=$approx exact=$exact")
  }

  test("approx percentiles bracket the exact median") {
    val df = Tables.lineitem(spark, sfSmoke)
    val exactMedian = df.stat.approxQuantile("l_quantity", Array(0.5), 0.0).head
    val sketched = df.stat.approxQuantile("l_quantity", Array(0.5), 0.05).head
    assert(math.abs(sketched - exactMedian) <= 5.0, s"sketched=$sketched exact=$exactMedian")
    val p = df.select(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)))
      .collect().head.getDouble(0)
    assert(math.abs(p - exactMedian) <= 5.0)
  }
}
