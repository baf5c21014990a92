package graft.lake

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{coalesce, length, lit, max, col}
import org.apache.spark.sql.types.{DataType, MetadataBuilder, StringType, StructField, StructType}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** K8 + §1.3 — versioned schema registry (SURVEY.md;
  * /root/reference/backend/schema_manager.py:52-95 version counter,
  * s3_helper.py:156-230 JSON snapshots + get-latest):
  * schema inference is Spark's own (`df.schema`), snapshots are
  * `StructType.json` documents under `{root}/{table}/v{N}.json`, DDL
  * comes from `schema.toDDL` — three reference subsystems (inference,
  * registry, DDL generation) collapse into the engine's native schema
  * machinery.
  */
object SchemaRegistry {
  private def dir(root: String, table: String) = Paths.get(root, table)

  private def versions(root: String, table: String): Seq[Int] = {
    val d = dir(root, table)
    if (!Files.exists(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d+\\.json") => s.stripPrefix("v").stripSuffix(".json").toInt }
      .toSeq
  }

  /** A8-analog: next version = COALESCE(MAX,0)+1 (schema_manager.py:69-75). */
  def nextVersion(root: String, table: String): Int =
    versions(root, table).maxOption.getOrElse(0) + 1

  /** Register df's schema; returns the version written. No-ops (returns the
    * current version) when the schema is unchanged — the reference's
    * change-detection (schema_manager.py:84-90). */
  def register(df: DataFrame, root: String, table: String): Int =
    registerSchema(df.schema, root, table)

  /** Register an explicit schema (same change-detection as [[register]]). */
  def registerSchema(schema: StructType, root: String, table: String): Int =
    latest(root, table) match {
      case Some((v, s)) if s == schema => v
      case _ =>
        val v = nextVersion(root, table)
        Files.createDirectories(dir(root, table))
        Files.writeString(dir(root, table).resolve(s"v$v.json"), schema.json)
        v
    }

  /** Sample-based schema inference over raw JSON documents — the bronze
    * ingest entry path for unseen feeds (reference
    * `backend/schema_manager.py:177-223`: type each field from the first
    * record, backfill null fields from later records, scan strings for
    * max length).
    *
    * Spark-first: `spark.read.json` over a bounded sample IS that
    * algorithm generalized — types are merged across the WHOLE sample, so
    * a field that is null in the first record picks up its type from any
    * later record (the reference's backfill loop), and records that
    * disagree widen (long+double -> double, anything+string -> string)
    * instead of keeping whichever happened to arrive first. One aggregate
    * pass then records per-string-field `max_length` metadata, the
    * reference's VARCHAR-sizing scan. Distributed end to end: the sample
    * bound keeps driver-side work nil and the length scan is a map-side
    * partial max.
    */
  def infer(spark: SparkSession, docs: Dataset[String], sampleSize: Int = 1000): StructType = {
    val sample = docs.limit(sampleSize).cache()
    try {
      val parsed = spark.read.json(sample)
      val strFields = parsed.schema.fields.filter(_.dataType == StringType).map(_.name)
      // backtick-quote field references: JSON feeds legally carry dots
      // (and even backticks) in names, which unquoted col() would parse
      // as nested access and fail to resolve
      def fcol(f: String) = col("`" + f.replace("`", "``") + "`")
      if (strFields.isEmpty) parsed.schema
      else {
        val maxRow = parsed.agg(
          coalesce(max(length(fcol(strFields.head))), lit(0)).as(strFields.head),
          strFields.tail.map(f => coalesce(max(length(fcol(f))), lit(0)).as(f)): _*).first()
        StructType(parsed.schema.fields.map {
          case f @ StructField(name, StringType, _, _) =>
            f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
              .putLong("max_length", maxRow.getAs[Number](name).longValue).build())
          case f => f
        })
      }
    } finally { sample.unpersist(); () }
  }

  /** Infer from raw JSON docs and register the result: a later, wider
    * batch (new field, widened type, longer strings) bumps the version;
    * an identical batch no-ops. */
  def registerInferred(spark: SparkSession, docs: Dataset[String], root: String,
                       table: String, sampleSize: Int = 1000): Int =
    registerSchema(infer(spark, docs, sampleSize), root, table)

  /** Latest registered schema, if any (s3_helper.py:196-230). */
  def latest(root: String, table: String): Option[(Int, StructType)] =
    versions(root, table).maxOption.map { v =>
      val json = Files.readString(dir(root, table).resolve(s"v$v.json"))
      (v, DataType.fromJson(json).asInstanceOf[StructType])
    }

  /** CREATE TABLE DDL from the latest schema (schema_manager.py:225-279). */
  def ddl(root: String, table: String): Option[String] =
    latest(root, table).map { case (_, s) => s"CREATE TABLE $table (${s.toDDL})" }
}
