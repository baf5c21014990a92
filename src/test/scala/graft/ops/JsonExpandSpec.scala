package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.types.StructType

/** F15 JSON expansion: prefixed flattening, permissive nulls for bad
  * JSON, and the corrupt-row audit flag that separates "garbage text"
  * from "genuinely null cell". */
class JsonExpandSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("a INT, b STRING")
  private val rows = Seq(
    (1L, """{"a": 5, "b": "x"}"""), // good
    (2L, """{"a": 6}"""),           // partial: b null, not corrupt
    (3L, """not json at all"""),    // corrupt
    (4L, null)                      // null cell
  ).toDF("id", "payload")

  test("expand flattens with prefix; bad JSON yields null fields") {
    val out = JsonExpand.expand(rows, "payload", schema)
    assert(out.columns.toSeq === Seq("id", "payload", "payload_a", "payload_b"))
    val byId = out.select("id", "payload_a", "payload_b")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(byId(1L) === (Some(5), Some("x")))
    assert(byId(2L) === (Some(6), None))
    assert(byId(3L) === (None, None))
    assert(byId(4L) === (None, None))
  }

  test("expandWithAudit flags garbage text but not null cells or partial objects") {
    val out = JsonExpand.expandWithAudit(rows, "payload", schema)
    val flags = out.select("id", "payload_corrupt")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(1L -> false, 2L -> false, 3L -> true, 4L -> false))
    // the quarantine split is a plain predicate
    assert(out.filter($"payload_corrupt").count() === 1)
  }
}
