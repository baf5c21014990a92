package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** K1 partitioned lake append + pruning read-back, K8 schema registry. */
class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("K1: append writes Hive partitions; readRange prunes to the date window") {
    val root = Files.createTempDirectory("lake").toString
    val df = Seq(
      (1L, "2024-01-15 10:00:00", 5.0),
      (2L, "2024-01-16 11:00:00", 6.0),
      (3L, "2024-02-20 12:00:00", 7.0))
      .toDF("id", "ts", "qty")
      .withColumn("ts", col("ts").cast("timestamp"))
    LakeWriter.append(df, root, "jde_dispatch", "ts")
    // layout on disk is Hive-style
    assert(new java.io.File(s"$root/jde_dispatch/year=2024/month=1/day=15").exists())
    // second append accumulates (append-only audit trail)
    LakeWriter.append(df.filter(col("id") === 1), root, "jde_dispatch", "ts")
    val janRead = LakeWriter.readRange(spark, root, "jde_dispatch", "2024-01-01", "2024-01-31")
    assert(janRead.count() === 3) // 2 original Jan rows + 1 re-appended
    assert(janRead.select("id").distinct().as[Long].collect().toSet === Set(1L, 2L))
    // pruning shows in the plan: partition filters present, Feb not scanned
    val plan = janRead.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
  }

  test("compaction merges small files, preserves data, and recovers from crashes") {
    val root = Files.createTempDirectory("lake").toString
    val day = Seq.tabulate(40)(i => (i.toLong, "2024-03-05 10:00:00", i * 1.5))
      .toDF("id", "ts", "qty")
      .withColumn("ts", col("ts").cast("timestamp"))
    // 4 micro-batch appends -> many small files in one day partition
    (0 until 4).foreach(k => LakeWriter.append(day.filter(col("id") % 4 === k), root, "d", "ts"))
    val dir = new java.io.File(s"$root/d/year=2024/month=3/day=5")
    val before = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 4)

    val after = LakeWriter.compact(spark, root, "d", 2024, 3, 5)
    assert(after < before && after >= 1)
    assert(dir.listFiles().count(_.getName.endsWith(".parquet")) === after)
    // no staging residue, data intact
    assert(!new java.io.File(s"$root/d/year=2024/month=3/.day=5.compact-tmp").exists())
    assert(!new java.io.File(s"$root/d/year=2024/month=3/.day=5.compact-old").exists())
    val read = LakeWriter.readRange(spark, root, "d", "2024-03-05", "2024-03-05")
    assert(read.count() === 40)
    assert(read.select("id").as[Long].collect().toSet === (0L until 40L).toSet)

    // a stale dot-prefixed staging sibling is invisible to partition
    // discovery (no bogus partition value, no schema drift of `day`)
    val stale = new java.io.File(s"$root/d/year=2024/month=3/.day=5.compact-tmp")
    assert(stale.mkdirs())
    assert(LakeWriter.readRange(spark, root, "d", "2024-03-01", "2024-03-31").count() === 40)

    // simulate the crash window: live dir gone, staged .compact-old holds
    // the partition, the stale tmp still lying around
    val old = new java.io.File(s"$root/d/year=2024/month=3/.day=5.compact-old")
    assert(dir.renameTo(old))
    assert(LakeWriter.restoreIfCrashed(spark, root, "d", 2024, 3, 5))
    assert(!stale.exists())
    assert(LakeWriter.readRange(spark, root, "d", "2024-03-05", "2024-03-05").count() === 40)
    // and a healthy partition is left alone
    assert(!LakeWriter.restoreIfCrashed(spark, root, "d", 2024, 3, 5))
  }

  test("K8: schema registry versions, change detection, latest, DDL") {
    val root = Files.createTempDirectory("schemas").toString
    val v1 = SchemaRegistry.register(Seq((1, "a")).toDF("id", "name"), root, "t")
    assert(v1 === 1)
    // unchanged schema -> same version (no new snapshot)
    assert(SchemaRegistry.register(Seq((2, "b")).toDF("id", "name"), root, "t") === 1)
    // evolved schema -> version 2
    val v2 = SchemaRegistry.register(
      Seq((1, "a", 2.0)).toDF("id", "name", "qty"), root, "t")
    assert(v2 === 2)
    val (latestV, latestSchema) = SchemaRegistry.latest(root, "t").get
    assert(latestV === 2 && latestSchema.fieldNames.toSeq === Seq("id", "name", "qty"))
    assert(SchemaRegistry.ddl(root, "t").get.startsWith("CREATE TABLE t ("))
  }

  test("sample-based JSON schema inference: null backfill, widening, max-length, versioning") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("inferred").toString

    // first record has a NULL qty — the reference backfills its type from
    // a later record (schema_manager.py:177-190); merged inference does
    // the same without order sensitivity
    val batch1 = Seq(
      """{"item": "widget", "qty": null}""",
      """{"item": "flange-xl", "qty": 3}""").toDS()
    val s1 = SchemaRegistry.infer(spark, batch1)
    assert(s1("qty").dataType === LongType, s1)
    assert(s1("item").dataType === StringType)
    // max-length scan over the sample (the reference's VARCHAR sizing)
    assert(s1("item").metadata.getLong("max_length") === 9)
    assert(SchemaRegistry.registerInferred(spark, batch1, root, "feed") === 1)

    // identical batch no-ops the version
    assert(SchemaRegistry.registerInferred(spark, batch1, root, "feed") === 1)

    // a later batch widens qty (long -> double), grows item's max length,
    // and adds a field -> new version with the widened schema
    val batch2 = Seq(
      """{"item": "widget-extra-long", "qty": 3.5, "lot": "L1"}""").toDS()
    val v2 = SchemaRegistry.registerInferred(spark, batch2, root, "feed")
    assert(v2 === 2)
    val (_, s2) = SchemaRegistry.latest(root, "feed").get
    assert(s2("qty").dataType === DoubleType, s2)
    assert(s2("item").metadata.getLong("max_length") === 17)
    assert(s2.fieldNames.contains("lot"))
  }
}
