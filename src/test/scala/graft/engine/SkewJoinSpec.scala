package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join: the runtime lever the session enables for the
  * hot-key problem salting solves manually (see `skew_salted_agg` for the
  * aggregation side). A join whose shuffle leaves one oversized partition
  * must be re-planned by AQE into split sub-partitions (plan shows
  * `skew=true`) — this is what survives a 1000x scale-up with a skewed
  * key distribution, with no query change. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot key's partition (skew=true in the final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a sort-merge join and make the skew thresholds small enough
      // that the test-sized hot partition counts as skewed
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")

      // 90% of the fact rows share one key; the dim is uniform
      val fact = spark.range(0, 200000)
        .select(
          when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 1000)
        .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))

      val joined = fact.join(dim, "k").groupBy("name").agg(sum("v").as("sv"))
      // collect() executes THIS Dataset's QueryExecution (a write.save()
      // would plan a fresh one and leave this plan un-finalized by AQE).
      // fact keys = {7} ∪ {0,10,…,990} -> 101 joined groups
      assert(joined.collect().length === 101)

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not flag the skewed join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
