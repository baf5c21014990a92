package graft.functions

import java.security.MessageDigest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F20 cache-key derivation (utility.py:428-494): byte-parity with the
  * reference's `sha256(f"{base_url}||{params_json}||{payload_json}")`
  * where the JSON blobs are `json.dumps(..., sort_keys=True,
  * separators=(',',':'))` over str-coerced values. Expected values are
  * sha256 over the exact canonical strings Python produces. */
class CacheKeySpec extends SparkSpec {
  import spark.implicits._

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("sorted keys, str-coerced values, '{}' payload — the reference byte format") {
    val row = Seq((42L, "actions")).toDF("uid", "kind")
      .select(CacheKey.derive(
        concat(lit("https://ops.example/api/"), col("kind")),
        // deliberately unsorted; ints not strings — both normalized
        Seq("uid" -> col("uid"), "size" -> lit(1000), "sort" -> lit("ts:1"))))
      .as[String].head()

    val expected = sha256Hex(
      """https://ops.example/api/actions||{"size":"1000","sort":"ts:1","uid":"42"}||{}""")
    assert(row === expected)
  }

  test("null param values serialize as JSON null (Python None)") {
    val row = Seq(Tuple1("x")).toDF("k")
      .select(CacheKey.derive(lit("https://h/p"),
        Seq("q" -> lit(null).cast("string"), "a" -> lit("1"))))
      .as[String].head()
    assert(row === sha256Hex("""https://h/p||{"a":"1","q":null}||{}"""))
  }

  test("no params and explicit payload") {
    val payload = CacheKey.canonicalJson(Seq("items" -> lit(3), "bu" -> lit("1110")))
    val row = Seq(Tuple1("x")).toDF("k")
      .select(CacheKey.derive(lit("https://h/p"), Seq.empty, payload))
      .as[String].head()
    assert(row === sha256Hex("""https://h/p||{}||{"bu":"1110","items":"3"}"""))
  }

  test("documented boolean pre-coercion reproduces Python str(True) bytes") {
    // Python str-coerces bools to "True"/"False"; a raw boolean cast gives
    // "true"/"false". The scaladoc's prescribed pre-coercion closes the gap.
    val row = Seq(Tuple1(true)).toDF("archived")
      .select(CacheKey.derive(lit("https://h/p"),
        Seq("archived" -> when(col("archived"), "True").otherwise("False"))))
      .as[String].head()
    assert(row === sha256Hex("""https://h/p||{"archived":"True"}||{}"""))
  }

  test("key is stable across row order and partitioning (pure projection)") {
    val df = spark.range(100)
      .select(col("id"), CacheKey.derive(lit("https://h/p"),
        Seq("uid" -> col("id"))).as("ck"))
    val once = df.orderBy("id").as[(Long, String)].collect()
    val again = df.repartition(7).orderBy("id").as[(Long, String)].collect()
    assert(once.toSeq === again.toSeq)
    assert(once.map(_._2).distinct.length === 100)
  }
}
