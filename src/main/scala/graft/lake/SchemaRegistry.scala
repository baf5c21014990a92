package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

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
  def register(df: DataFrame, root: String, table: String): Int = {
    val schema = df.schema
    latest(root, table) match {
      case Some((v, s)) if s == schema => v
      case _ =>
        val v = nextVersion(root, table)
        Files.createDirectories(dir(root, table))
        Files.writeString(dir(root, table).resolve(s"v$v.json"), schema.json)
        v
    }
  }

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
