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

  /** Release a superseded checkpoint's blocks eagerly instead of waiting
    * for the ContextCleaner to notice the dead reference — the
    * loop-carried-frame discipline (PLANS.md "cutLineage loop-site
    * classification"): once a round's replacement frame has MATERIALIZED
    * (eager cut), the previous round's blocks are dead weight, and
    * releasing them bounds the loop's block-store footprint by the
    * current frame instead of rounds × frame.
    *
    * ONLY call this on a frame the caller's own loop checkpointed and
    * that nothing downstream references (a caller-derived frame's
    * lineage can contain the CALLER's checkpoint-backed inputs, and
    * unpersisting those mid-job is unrecoverable — truncated lineage
    * cannot recompute). The walk unpersists every LogicalRDD in the
    * frame's analyzed plan; for a frame returned by `cutLineage` that
    * is exactly its own checkpoint RDD. */
  def releaseCut(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false); ()
      case _ => ()
    }
}
