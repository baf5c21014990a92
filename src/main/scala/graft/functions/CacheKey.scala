package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F20 — deterministic cache-key derivation (SURVEY.md §2.8;
  * /root/reference/backend/utility.py:428-494 `_create_cache_key`): the
  * request-identity hash behind the reference's TTL'd response cache.
  *
  * The reference canonicalizes as
  * `sha256(f"{base_url}||{params_json}||{payload_json}")` where both JSON
  * blobs are `json.dumps(..., sort_keys=True, separators=(',',':'))` over
  * a dict whose leaf values were coerced to `str` (utility.py:448-459
  * `normalize_dict`) and `{}` stands in for an absent dict. This object
  * reproduces that byte format with pure column expressions:
  * `to_json(struct(...))` with fields pre-sorted by name and values cast
  * to string emits the identical compact `{"k":"v","k2":null}` form
  * (nulls kept, `ignoreNullFields=false`, matching Python's `None → null`),
  * and `sha2(_, 256)` yields the same lowercase hex as `hashlib.sha256`.
  *
  * Param keys are compile-time constants here (they are literal dict keys
  * at every reference call site), so the sort happens at plan time — the
  * whole key derivation stays inside whole-stage codegen with zero UDFs.
  *
  * Parity scope — byte-identity with the reference holds for the value
  * shapes its call sites actually pass (ASCII strings and numbers, the
  * URL/query-param domain). Two Python-isms are deliberately NOT
  * reproduced: `json.dumps` default `ensure_ascii=True` escapes non-ASCII
  * as `\uXXXX` where `to_json` emits raw UTF-8, and Python `str(True)` is
  * `"True"` where a boolean column casts to `"true"` — callers hashing
  * such values against reference-derived keys must pre-coerce them to
  * the reference's string forms first (`when(b, "True").otherwise("False")`).
  */
object CacheKey {

  /** Compact sorted-key JSON of `params` with string-coerced values —
    * the `params_json`/`payload_json` building block. Empty params → `{}`
    * (utility.py:477: absent dict serializes as the empty object).
    */
  def canonicalJson(params: Seq[(String, Column)]): Column =
    if (params.isEmpty) lit("{}")
    else
      to_json(
        struct(params.sortBy(_._1).map { case (k, v) => v.cast("string").as(k) }: _*),
        Map("ignoreNullFields" -> "false"))

  /** The cache key: `sha256(base_url || "||" || params_json || "||" ||
    * payload_json)` (utility.py:484-493). `payloadJson` must already be a
    * canonical JSON string column (use [[canonicalJson]]); null → `{}`.
    */
  def derive(baseUrl: Column, params: Seq[(String, Column)],
             payloadJson: Column = lit("{}")): Column =
    sha2(
      concat(
        baseUrl, lit("||"),
        coalesce(canonicalJson(params), lit("{}")), lit("||"),
        coalesce(payloadJson, lit("{}"))),
      256)
}
