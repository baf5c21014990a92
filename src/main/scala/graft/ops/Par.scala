package graft.ops

import org.apache.spark.sql.Dataset

/** Scan-side parallelism repair for CPU-heavy row-local passes.
  *
  * The driver's testdata writes every table as ONE parquet row group, and
  * a row group is the unit of scan splitting — so any stage fed directly
  * by a scan runs at most one real task no matter how many cores the
  * session has (the optimization guide's "one huge unsplittable file"
  * input-skew case, §2.5: *repartition immediately after the read*).
  * That is invisible for cheap projections but serializes the expensive
  * row-local folds (per-shingle md5 minhashes, tokenize passes, nested
  * struct builds) that dominate several dedup/text operators.
  *
  * [[spread]] round-robin-repartitions the frame to a width derived from
  * the frame's own optimizer size estimate — never a constant, never more
  * than the session's parallelism — so the call is scale-adaptive: on a
  * real multi-row-group/multi-file table at cluster scale the scan
  * already yields >= parallelism splits and the width formula saturates
  * at `defaultParallelism`, where the extra exchange is one cheap
  * narrow-payload pass (and can be dropped entirely by the planner's
  * AQE coalescing if the input is genuinely large). At toy scale the
  * width degrades toward 1 so sub-megabyte frames don't pay 32-way
  * scheduling for microseconds of work. Round-robin keeps per-partition
  * row counts even (Spark's sort-before-repartition makes the assignment
  * retry-deterministic); results are partition-independent by the
  * catalog's determinism contract, so the rewrite never changes rows.
  */
object Par {
  /** Bytes of (estimated) input one task should carry through a
    * CPU-heavy row-local pass. Deliberately far below the scan-split
    * size: these passes cost orders of magnitude more CPU per byte than
    * a plain scan. Overridable for experiments via
    * `spark.graft.spread.bytesPerTask`. */
  private val DefaultBytesPerTask = 32L * 1024

  def spread[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val bytesPerTask = spark.conf.getOption("spark.graft.spread.bytesPerTask")
      .map(_.toLong).getOrElse(DefaultBytesPerTask)
    val bytes = ds.queryExecution.optimizedPlan.stats.sizeInBytes
    val cap = spark.sparkContext.defaultParallelism
    val n = bytes./(bytesPerTask).min(BigInt(cap)).max(BigInt(1)).toInt
    // no-op when the scan already splits at least that wide — on a real
    // multi-file/multi-row-group table the natural split count exceeds
    // the core count and no repartition (of any width) is wanted
    if (n <= 1 || ds.rdd.getNumPartitions >= n) ds else ds.repartition(n)
  }
}
