package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic shard derivation for the dataloader contract
  * (`s_epoch_shuffle`): every row hashes to a stable shard in
  * `[0, nShards)`, so shard membership survives retries, repartitioning,
  * and topology changes — the property `rand()` and `zipWithIndex` both
  * lack. A 1000-worker training job assigns shard w to worker w and each
  * worker reads only its shard in per-epoch order.
  *
  * The int comes from md5 hex nibbles located by position in the hex
  * alphabet (`instr('0123456789abcdef', c) - 1`): byte-identical
  * semantics in Spark and DuckDB, neither of which ships a portable
  * hex→int conversion (DuckDB 1.0 has no conv; Spark's conv has no DuckDB
  * twin). Two nibbles span 256 shards — one per worker up to a 256-wide
  * fleet, and the construction extends a nibble at a time (16× per extra
  * char) if a larger fleet ever needs it.
  */
object Sharding {
  val HexAlphabet = "0123456789abcdef"

  /** Stable shard in `[0, nShards)` for `key` under `seed`. Uniform when
    * `nShards` divides 256 (powers of two — the shape worker fleets have);
    * other counts inherit a slight modulo bias of at most 1/16th of a
    * shard's mass. */
  def shardOf(key: Column, seed: String, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 256,
      s"nShards=$nShards out of range: two md5 nibbles span at most 256 shards")
    val h = md5(concat(key.cast("string"), lit(seed)))
    def nibble(pos: Int): Column =
      call_function("instr", lit(HexAlphabet), substring(h, pos, 1)) - 1
    pmod(nibble(1) * 16 + nibble(2), lit(nShards)).cast("int")
  }
}
