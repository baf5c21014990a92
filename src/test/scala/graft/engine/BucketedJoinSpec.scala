package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing — the co-located join technique for repeated large-large
  * joins (SURVEY.md "Partitioning & shuffle"): both sides bucketed on the
  * join key at write time join WITHOUT any shuffle exchange. At 100 TB
  * this converts the recurring fact-to-fact join from two full shuffles
  * per run into zero. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bdb LOCATION '$wh'")
    try {
      val li = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      val ord = spark.read.parquet(s"$sfSmoke/orders.parquet")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bdb.lineitem_b")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bdb.orders_b")

      val joined = spark.table("bdb.lineitem_b")
        .join(spark.table("bdb.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the join itself is shuffle-free; the only exchange is the final
      // 3-row aggregate
      assert(exchanges.length <= 1, joined.queryExecution.executedPlan.toString)

      // and it computes the same thing as the shuffled plan
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderstatus").collect().toSeq ===
        expected.orderBy("o_orderstatus").collect().toSeq)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")
    }
  }
}
