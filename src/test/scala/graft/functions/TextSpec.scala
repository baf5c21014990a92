package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text library invariants: shingle counts, winnow stability, normalized
  * keys' order-insensitivity. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private def withToks(texts: String*) =
    texts.toDF("text").withColumn("toks", Text.tokens($"text"))

  test("shingle count is n_tokens - k + 1; short docs give empty") {
    val out = withToks("a b c d e", "a b", "x")
      .select(size(Text.shinglesOfTokens($"toks", 3))).as[Int].collect().toSeq
    assert(out === Seq(3, 0, 0))
    val sh = withToks("big fast table scan now")
      .select(Text.shinglesOfTokens($"toks", 3)).as[Seq[String]].collect().head
    assert(sh === Seq("big fast table", "fast table scan", "table scan now"))
  }

  test("normalized key ignores order and duplicates; differs on content") {
    val keys = withToks("b a c", "c b a a", "a b d")
      .select(Text.normalizedKey($"text")).as[String].collect().toSeq
    assert(keys(0) === keys(1))
    assert(keys(0) !== keys(2))
  }

  test("winnow fingerprint survives appends outside the minimizing window") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val Seq(w1, w2) = withToks(base, base + " appended tail words here maybe")
      .select(Text.winnowOfTokens($"toks", 5)).as[String].collect().toSeq
    // the min window of the base text usually stays the min after appends;
    // at minimum both are valid md5s and the base's winnow is one of the
    // extended text's window hashes
    val windows2 = withToks(base + " appended tail words here maybe")
      .select(transform(Text.shinglesOfTokens($"toks", 5), s => md5(s)))
      .as[Seq[String]].collect().head
    assert(windows2.contains(w1) || w2 < w1)
  }

  test("marker hits count membership, case-folded") {
    val n = withToks("The big THE the small")
      .select(Text.markerHits($"text", Seq("the"))).as[Int].collect().head
    assert(n === 3)
  }
}
