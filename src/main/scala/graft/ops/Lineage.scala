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

  /** Append-only checkpoint accumulator — the guard the loop-site
    * classification table's APPEND-ONLY rows (PLANS.md) relied on a
    * comment for until round 16. Loops whose result is the UNION of
    * per-round deltas (BFS level frames, k-core peel batches) pin one
    * block set per round by construction: every prior delta stays
    * referenced by the running union, so nothing is ever superseded and
    * `releaseCut` has nothing to release. Fine at 3 rounds; a 100-round
    * loop would hold 100 live block sets. This accumulator bounds that:
    * once more than `coalesceEvery` deltas are live, it unions them into
    * ONE fresh cut (eager, so the data is safely re-materialized first),
    * releases the superseded per-round blocks, and continues from the
    * merged frame — live block sets never exceed `coalesceEvery + 1`,
    * and each delta row is re-serialized at most once per `coalesceEvery`
    * rounds (amortized O(1) serialize work per row, vs the O(rounds)
    * re-cut-the-union-every-round shape round 14 removed).
    *
    * Every frame passed to [[add]] MUST be a frame returned by
    * [[LineageOps.cutLineage]] — coalescing releases the added frames'
    * blocks, and a DERIVED plan would walk to its inputs' checkpoints
    * and release those instead (unrecoverable: truncated lineage cannot
    * recompute). The require below fails loudly on any other shape.
    * Callers must also re-derive any round-local view (e.g. the BFS
    * frontier) from [[union]] when `add` reports a coalesce, because the
    * individual delta it was derived from is gone. */
  final class AppendOnlyCuts(coalesceEvery: Int) {
    require(coalesceEvery >= 1, s"coalesceEvery must be >= 1, got $coalesceEvery")
    private val frames =
      scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    private var merges = 0
    /** Live checkpointed frames (bounded at coalesceEvery + 1). */
    def frameCount: Int = frames.length
    /** How many coalesces have happened (deep-loop test observability). */
    def coalesceCount: Int = merges
    /** Append a freshly cut delta; returns true iff this add coalesced
      * (callers holding views of earlier deltas must re-derive them). */
    def add(delta: org.apache.spark.sql.DataFrame): Boolean = {
      require(delta.queryExecution.analyzed
          .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
        "AppendOnlyCuts.add requires a frame produced by cutLineage: " +
          "coalescing releases the added frame's blocks, and a derived " +
          "plan would release its INPUTS' checkpoints instead " +
          s"(got plan class ${delta.queryExecution.analyzed.getClass.getSimpleName})")
      frames += delta
      if (frames.length > coalesceEvery) {
        val merged = union.cutLineage() // eager: materialized BEFORE release
        frames.foreach(releaseCut)
        frames.clear()
        frames += merged
        merges += 1
        true
      } else false
    }
    /** The running union of everything appended so far. */
    def union: org.apache.spark.sql.DataFrame = {
      require(frames.nonEmpty, "AppendOnlyCuts.union on an empty accumulator")
      frames.reduce(_ unionAll _)
    }
    def isEmpty: Boolean = frames.isEmpty
  }
}
