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
