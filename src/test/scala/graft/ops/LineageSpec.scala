package graft.ops

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec
import graft.ops.Lineage._

/** Pins the serialized-storage contract of `cutLineage` (round 13): the
  * 20× bench attempt OOM'd an 8 GiB heap unrolling a DESERIALIZED
  * `localCheckpoint` of `g_sssp_bellman`'s frontier across 32 concurrent
  * tasks, killing the shared local SparkContext. `cutLineage` must keep
  * (a) the lineage cut and (b) MEMORY_AND_DISK_SER block storage — a
  * regression back to `Dataset.localCheckpoint`'s deserialized default
  * would reintroduce the OOM at exactly the scale the small suites never
  * reach, so the storage level is asserted here, not assumed.
  */
class LineageSpec extends SparkSpec {

  test("cutLineage stores checkpoint blocks MEMORY_AND_DISK_SER and cuts lineage") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 1000).toDF("n").filter($"n" % 7 === 0).cutLineage()
    assert(df.count() === 142)

    val newRdds = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    assert(newRdds.nonEmpty, "cutLineage must register a persistent RDD")
    val levels = newRdds.values.map(_.getStorageLevel).toSeq
    assert(levels.forall(l => l.useDisk && !l.deserialized),
      s"checkpoint blocks must be serialized disk-backed, got $levels")

    // lineage is actually truncated: the checkpointed plan no longer
    // depends on the original LocalTableScan/filter chain
    assert(df.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LogicalRDD")),
      "cutLineage must replace the upstream plan with the checkpointed RDD")

    newRdds.values.foreach(_.unpersist(blocking = false))
  }

  test("AppendOnlyCuts bounds live block sets and preserves the union") {
    // round-16 guard (r15 verdict #3): append-only loops used to pin one
    // block set per round forever — fine at 3 rounds, silent
    // accumulation at 100. The accumulator must coalesce past the bound,
    // release the superseded deltas, and lose no rows doing it.
    import spark.implicits._
    val sc = spark.sparkContext
    val base = sc.getPersistentRDDs.keySet
    val acc = new Lineage.AppendOnlyCuts(4)
    var maxLive = 0
    (0 until 13).foreach { i =>
      val coalesced = acc.add((i * 10 until i * 10 + 10).toDF("n").cutLineage())
      assert(coalesced === (i == 4 || i == 8 || i == 12),
        s"coalesce fired at the wrong add ($i)")
      maxLive = math.max(maxLive,
        sc.getPersistentRDDs.keySet.diff(base).size)
    }
    // 13 adds at coalesceEvery=4: merges fire on adds 5, 9, 13
    assert(acc.coalesceCount === 3)
    assert(acc.frameCount === 1, "post-merge the accumulator holds ONE frame")
    assert(maxLive <= 6,
      s"live block sets must stay bounded by coalesceEvery + 2, saw $maxLive")
    // data integrity across merges: every appended row, exactly once
    assert(acc.union.as[Int].collect().sorted === (0 until 130).toArray)
    assert(sc.getPersistentRDDs.keySet.diff(base).size <= 1,
      "superseded per-round deltas must be released after the final merge")
    sc.getPersistentRDDs
      .filterNot { case (id, _) => base.contains(id) }
      .values.foreach(_.unpersist(blocking = false))
  }

  test("AppendOnlyCuts refuses a derived (non-checkpoint) frame loudly") {
    // coalescing RELEASES the added frames' blocks; on a derived plan the
    // release would walk to the INPUTS' checkpoints — unrecoverable. The
    // guard must fail at add time, not corrupt state at merge time.
    import spark.implicits._
    val acc = new Lineage.AppendOnlyCuts(4)
    val cut = (1 to 10).toDF("n").cutLineage()
    val derived = cut.filter($"n" > 3)
    val e = intercept[IllegalArgumentException](acc.add(derived))
    assert(e.getMessage.contains("cutLineage"))
    assert(acc.isEmpty, "a refused add must not enqueue the frame")
    Lineage.releaseCut(cut)
  }

  test("cutLineage(false) stays lazy until an action materializes it") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 100).toDF("n").cutLineage(eager = false)
    val lazyNew = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
      .values.filter(_.getStorageLevel.useMemory)
    // nothing materialized yet: no blocks cached for this frame
    assert(df.count() === 100)
    val after = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
    assert(after.values.forall(r => !r.getStorageLevel.deserialized),
      "lazy cutLineage must still use serialized storage once materialized")
    after.values.foreach(_.unpersist(blocking = false))
    assert(lazyNew.isEmpty || lazyNew.forall(!_.getStorageLevel.deserialized))
  }
}
