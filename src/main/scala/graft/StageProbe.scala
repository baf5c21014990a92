package graft

import graft.queries.Catalog
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: per-stage timing/shuffle breakdown for one catalog query —
  * the empirical half of the optimization loop (guide §1.1) with the UI
  * disabled. Prints, for every stage the query runs: wall duration, summed
  * executor run time, task count, shuffle read/write bytes and the call
  * site, plus per-job boundaries (each eager localCheckpoint is its own
  * job, so iterative queries read as one block per round). Usage:
  *   tools/run.sh graft.StageProbe [sfDir] <queryName> [cpus]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args(1)
    val cpus = args.lift(2).map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        println(f"---- job ${js.jobId}%3d @ ${(System.nanoTime() - t0) / 1e9}%7.2f s  (${js.stageInfos.size} stages)")
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        val m = si.taskMetrics
        println(f"stage ${si.stageId}%4d wall=$wall%6.2fs exec=${m.executorRunTime / 1e3}%7.2fs " +
          f"tasks=${si.numTasks}%4d shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  ${si.name.take(90)}")
      }
    })
    // warm-up: JIT/codegen/parquet footers, so the probe run isn't noise
    try Catalog.byName(name).build(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"warm-up failed: $e") }
    println("==== probe run ====")
    t0 = System.nanoTime()
    Catalog.byName(name).build(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"==== total ${(System.nanoTime() - t0) / 1e9}%.2f s ====")
    spark.stop()
  }
}
