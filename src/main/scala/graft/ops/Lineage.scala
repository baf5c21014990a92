package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Lineage truncation for iterative/reused frames.
  *
  * Every fixpoint loop (connected components, pagerank, SSSP, k-core)
  * and multi-consumer intermediate in this engine cuts lineage with a
  * LOCAL checkpoint — but `Dataset.localCheckpoint(eager)` caches the
  * materialized RDD at MEMORY_AND_DISK **deserialized**, and unrolling
  * deserialized `UnsafeRow` copies across 32 concurrent local-mode tasks
  * is exactly what killed the 20× bench attempt with a Java-heap OOM
  * (round 13, `g_sssp_bellman`: `MemoryStore.putIteratorAsValues` →
  * `UnsafeRow.copy` OOM at 8 GiB, stopping the shared SparkContext).
  *
  * `cutLineage` is the drop-in replacement: same lineage cut, same
  * eager/lazy choice, but the checkpoint blocks are stored
  * MEMORY_AND_DISK_SER — serialized blocks are several times smaller,
  * unroll through the byte-buffer path with honest memory accounting,
  * and evict/spill per-block instead of blowing the heap. At cluster
  * scale the same choice bounds executor memory for checkpoint blocks
  * by the storage pool, trading a cheap ser/deser pass per round for
  * OOM-free degradation — the same "degrade to disk, don't die"
  * contract the constrained bench pass measures for shuffles.
  *
  * (A durable-infrastructure deployment swaps this for reliable
  * `checkpoint()` to cluster storage — see PLANS.md; the storage-level
  * concern is identical.)
  */
object Lineage {
  implicit class LineageOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** `localCheckpoint` with serialized block storage. `eager` defaults
      * to true to mirror `Dataset.localCheckpoint()`. */
    def cutLineage(eager: Boolean = true): Dataset[T] =
      ds.localCheckpoint(eager, StorageLevel.MEMORY_AND_DISK_SER)
  }
}
