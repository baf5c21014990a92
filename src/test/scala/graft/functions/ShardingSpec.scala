package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shard derivation for the epoch-shuffle dataloader contract: range,
  * determinism, and near-uniform balance at the full 256-shard width a
  * real worker fleet uses. */
class ShardingSpec extends SparkSpec {

  test("256 shards: in-range, deterministic, and loosely uniform over 100k keys") {
    val n = 100000L
    val counts = spark.range(n)
      .select(Sharding.shardOf(col("id"), ":shard-seed-42", 256).as("shard"))
      .groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0 until 256).toSet, "every shard must be hit")
    // expected ~390.6 per shard, sigma ~19.7; +-5 sigma is a loose bound
    // that still trips on any systematic skew (the old ascii() derivation
    // put hex-digit gaps at 2x mass and capped out at 16 values)
    val (lo, hi) = (250L, 550L)
    val bad = counts.filter { case (_, c) => c < lo || c > hi }
    assert(bad.isEmpty, s"shard counts outside [$lo,$hi]: $bad")
    // deterministic: a second evaluation produces identical assignments
    val a = spark.range(100)
      .select(col("id"), Sharding.shardOf(col("id"), ":shard-seed-42", 256).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = spark.range(100)
      .select(col("id"), Sharding.shardOf(col("id"), ":shard-seed-42", 256).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  test("seed changes reshuffle membership; nShards bounds are enforced") {
    val joined = spark.range(1000)
      .select(col("id"),
        Sharding.shardOf(col("id"), ":seed-a", 256).as("sa"),
        Sharding.shardOf(col("id"), ":seed-b", 256).as("sb"))
    val moved = joined.filter(col("sa") =!= col("sb")).count()
    assert(moved > 900, s"different seeds should move ~255/256 of keys, moved $moved")
    intercept[IllegalArgumentException] {
      Sharding.shardOf(col("id"), ":s", 257)
    }
    intercept[IllegalArgumentException] {
      Sharding.shardOf(col("id"), ":s", 0)
    }
  }
}
