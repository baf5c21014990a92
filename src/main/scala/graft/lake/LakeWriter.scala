package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K1 — the lake sink (SURVEY.md §2.2;
  * /root/reference/backend/s3_helper.py:29-75 `store_jde_dispatch`): every
  * dispatch/fetch/creation appended as Parquet under
  * `{root}/{recordType}/year=Y/month=M/day=D/`, which IS the audit trail /
  * bronze layer.
  *
  * Spark-first: `partitionBy("year","month","day")` writes the same
  * Hive-style layout the reference assembled by hand, and reads get
  * partition pruning free (S8's manual key-parsing listing,
  * s3_helper.py:101-154, becomes a `filter` on partition columns).
  * Scale: append-mode tasks write independently per partition — no
  * coordination, no driver bottleneck; object metadata (record_count)
  * becomes Parquet row-group stats.
  */
object LakeWriter {
  /** Append records to the lake under their event date (derived from
    * `tsCol`), Hive-partitioned year/month/day. */
  def append(df: DataFrame, root: String, recordType: String, tsCol: String): Unit =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .write.mode("append")
      .partitionBy("year", "month", "day")
      .parquet(s"$root/$recordType")

  /** Append CLUSTERED by a key within each date partition: rows are
    * sorted on `clusterCols` inside every write task, so each Parquet
    * row group covers a narrow key range and a key-predicate read skips
    * whole row groups on min/max stats — the data-clustering lever
    * (Z-order's 1-D case) that cuts scan bytes at 100 TB without any
    * table format. Costs one in-task sort at write time; the layout on
    * disk is identical otherwise. */
  def appendClustered(df: DataFrame, root: String, recordType: String,
                      tsCol: String, clusterCols: Seq[String]): Unit =
    df.withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .repartition(col("year"), col("month"), col("day"))
      .sortWithinPartitions(("year" +: "month" +: "day" +: clusterCols).map(col): _*)
      .write.mode("append")
      .partitionBy("year", "month", "day")
      .parquet(s"$root/$recordType")

  /** Read a record type with an inclusive date-range filter — resolved by
    * partition pruning, never a full-lake scan (replaces S8's manual
    * listing+parse, s3_helper.py:136-140). */
  def readRange(spark: SparkSession, root: String, recordType: String,
                startDate: String, endDate: String): DataFrame =
    spark.read.parquet(s"$root/$recordType")
      .filter(make_date(col("year"), col("month"), col("day"))
        .between(lit(startDate).cast("date"), lit(endDate).cast("date")))

  /** Compact one day partition's accumulated small files into
    * ~`targetBytes`-sized files. Micro-batch appends (5-minute cadence ×
    * 32 tasks) leave thousands of tiny files per day; at 100 TB that
    * kills scan planning (file listing) and read throughput (row-group
    * per file), so compaction is part of the sink's contract, run as a
    * nightly maintenance job per closed partition.
    *
    * Swap protocol (single maintenance writer, same model as
    * [[graft.state.DispatchState]]): write compacted files to a `.tmp`
    * sibling, rename the live dir aside to `.old`, promote `.tmp`, then
    * drop `.old`. A crash leaves either the live dir or a restorable
    * `.old` (see [[restoreIfCrashed]]) — never a lost partition. On a
    * table format (Delta/Iceberg) this whole method becomes `OPTIMIZE`;
    * call sites don't change.
    *
    * @return number of files after compaction */
  def compact(spark: SparkSession, root: String, recordType: String,
              year: Int, month: Int, day: Int,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(s"$root/$recordType/year=$year/month=$month/day=$day")
    require(fs.exists(dir), s"no partition at $dir")
    val bytes = fs.getContentSummary(dir).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    // dot-prefixed staging names: Spark/Hive partition discovery skips
    // entries starting with '.' or '_', so a crash can never leave a
    // half-compacted sibling visible as a bogus "day=N.tmp" partition
    // value (which would also flip the inferred partition type to string)
    val tmp = new Path(dir.getParent, s".${dir.getName}.compact-tmp")
    val old = new Path(dir.getParent, s".${dir.getName}.compact-old")
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale from a dead run
    // leaf-dir read: partition values live in the path, not the files,
    // so the rewrite round-trips the data columns byte-identically
    spark.read.parquet(dir.toString)
      .repartition(nFiles)
      .write.parquet(tmp.toString)
    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"could not stage $dir aside")
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir) // roll back: restore the original partition
      throw new java.io.IOException(s"could not promote compacted $tmp")
    }
    fs.delete(old, true)
    fs.listStatus(dir).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Crash recovery for [[compact]]: if a compaction died between the two
    * renames, the live dir is missing and the staged `.compact-old` holds
    * the data — put it back (the rename's own result is the verdict: HDFS
    * signals failure by return value, not exception). Stale `.compact-tmp`
    * from a run that died pre-swap is dropped either way. Call on
    * maintenance-job startup. @return true iff a restore happened. */
  def restoreIfCrashed(spark: SparkSession, root: String, recordType: String,
                       year: Int, month: Int, day: Int): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(s"$root/$recordType/year=$year/month=$month/day=$day")
    val tmp = new Path(dir.getParent, s".${dir.getName}.compact-tmp")
    val old = new Path(dir.getParent, s".${dir.getName}.compact-old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (!fs.exists(dir) && fs.exists(old)) fs.rename(old, dir)
    else false
  }
}
