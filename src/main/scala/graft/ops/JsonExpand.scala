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
}
