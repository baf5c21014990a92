package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** F15 JSON-string-column expansion (SURVEY.md §2.8;
  * /root/reference/backend/main.py:128-150 `expand_json_columns`): parse a
  * JSON TEXT column against an explicit schema and flatten its fields as
  * top-level columns prefixed `<colName>_`, like the reference's
  * `pd.json_normalize` + prefix. Bad JSON yields null fields (the reference
  * substitutes `{}`), which `from_json`'s permissive mode gives us free.
  *
  * Scale note: `from_json` is a codegen'd expression — the parse happens
  * inside the scan's whole-stage-codegen pipeline, no shuffle, no UDF.
  */
object JsonExpand {
  def expand(df: DataFrame, colName: String, schema: StructType): DataFrame = {
    val parsed = from_json(col(colName), schema)
    val fields: Seq[Column] =
      schema.fields.toSeq.map(f => parsed.getField(f.name).as(s"${colName}_${f.name}"))
    df.select((df.columns.map(col).toSeq ++ fields): _*)
  }

  /** [[expand]] plus a `<colName>_corrupt` audit flag: true when the cell
    * held text that did not parse as a JSON object, false for parsed rows
    * AND for genuinely-null cells. Permissive `from_json` hands malformed
    * input back as an all-null struct — indistinguishable from a real
    * `{"a":null,...}` — so the flag rides the parser's own
    * columnNameOfCorruptRecord channel instead of guessing from nulls.
    * A 100 TB feed always contains garbage rows; dropping them silently
    * (the reference's `{}` substitution) loses the signal a data-quality
    * monitor needs, so the flag makes the quarantine split
    * (`filter($"x_corrupt")`) a plain predicate instead of a re-parse. */
  def expandWithAudit(df: DataFrame, colName: String, schema: StructType): DataFrame = {
    val crField = "_graft_corrupt_record"
    require(!schema.fieldNames.contains(crField), s"schema reserves $crField")
    val parseSchema = schema.add(crField, org.apache.spark.sql.types.StringType)
    val parsed = from_json(col(colName), parseSchema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> crField))
    val fields: Seq[Column] =
      schema.fields.toSeq.map(f => parsed.getField(f.name).as(s"${colName}_${f.name}"))
    val corrupt = parsed.getField(crField).isNotNull.as(s"${colName}_corrupt")
    df.select((df.columns.map(col).toSeq ++ fields :+ corrupt): _*)
  }
}
