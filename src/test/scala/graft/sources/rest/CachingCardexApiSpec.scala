package graft.sources.rest

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.functions.CacheKey
import org.apache.spark.sql.functions._

/** The GET memo decorator vs the reference's `retry_request_lru` contract
  * (utility.py:275-334): hit short-circuits the delegate, TTL expiry
  * refetches, empties are never cached, keys are request-identities, the
  * retry ladder composes OUTSIDE the cache, and the client-side key is
  * byte-identical to the engine-level F20 expression.
  */
class CachingCardexApiSpec extends SparkSpec {

  /** Minimal counting delegate with scriptable behavior. */
  private final class Counting(rows: Int, failFirst: Boolean = false) extends CardexApi {
    val fetches = new AtomicInteger(0)
    override def fetch(page: Int, rowsPerPage: Int, buParam: Option[String],
                       minDateParam: Option[Int]): Iterator[(String, String, Int, Double)] = {
      val n = fetches.incrementAndGet()
      if (failFirst && n == 1) throw CardexApi.TransientError(page)
      (0 until rows).iterator.map(i => (s"r$page-$i", "9000", 0, i.toDouble))
    }
    override def publishedPages(default: Int): Int = default
    override def sleep(page: Int, ms: Long): Unit = ()
  }

  private var nowMs = 0L
  private def api(inner: CardexApi, scope: String, ttlMs: Long = 3600000L) =
    CachingCardexApi(inner, scope = scope, ttlMs = ttlMs, clock = () => nowMs)

  test("second fetch of the same request is a cache hit (delegate not called)") {
    CachingCardexApi.clear("s1"); nowMs = 0L
    val inner = new Counting(5)
    val a = api(inner, "s1")
    assert(a.fetch(1, 10, Some("9000"), None).toVector.size === 5)
    assert(a.fetch(1, 10, Some("9000"), None).toVector.size === 5)
    assert(inner.fetches.get === 1)
  }

  test("TTL expiry refetches and replaces (process-local memo, no tombstone)") {
    CachingCardexApi.clear("s2"); nowMs = 0L
    val inner = new Counting(3)
    val a = api(inner, "s2", ttlMs = 1000L)
    a.fetch(1, 10, None, None).toVector
    nowMs = 1001L
    a.fetch(1, 10, None, None).toVector
    assert(inner.fetches.get === 2)
    // the refetch re-primed the cache: a third call inside the new window hits
    nowMs = 1500L
    a.fetch(1, 10, None, None).toVector
    assert(inner.fetches.get === 2)
  }

  test("empty responses are never cached (utility.py:322-329)") {
    CachingCardexApi.clear("s3"); nowMs = 0L
    val inner = new Counting(0)
    val a = api(inner, "s3")
    assert(a.fetch(1, 10, None, None).isEmpty)
    assert(a.fetch(1, 10, None, None).isEmpty)
    assert(inner.fetches.get === 2)
  }

  test("distinct request params are distinct cache entries") {
    CachingCardexApi.clear("s4"); nowMs = 0L
    val inner = new Counting(2)
    val a = api(inner, "s4")
    a.fetch(1, 10, None, None).toVector
    a.fetch(2, 10, None, None).toVector
    a.fetch(1, 10, Some("9000"), None).toVector
    a.fetch(1, 10, None, Some(20240101)).toVector
    assert(inner.fetches.get === 4)
  }

  test("invalidate forces a refetch (the post-write staleness hook)") {
    CachingCardexApi.clear("s5"); nowMs = 0L
    val inner = new Counting(2)
    val a = api(inner, "s5")
    a.fetch(1, 10, None, None).toVector
    assert(a.invalidate(1, 10, None, None))
    assert(!a.invalidate(1, 10, None, None))
    a.fetch(1, 10, None, None).toVector
    assert(inner.fetches.get === 2)
  }

  test("clients with different identities never share a namespace") {
    CachingCardexApi.clear("s7"); nowMs = 0L
    // same scope, different backends: the second must NOT see the first's rows
    val a = api(FakeCardexClient("nsA"), "s7")
    val b = api(FakeCardexClient("nsB"), "s7")
    assert(a.namespace !== b.namespace)
    val fromA = a.fetch(1, 3, None, None).toVector
    val innerB = new Counting(3)
    val c = api(innerB, "s7")
    c.fetch(1, 3, None, None).toVector
    assert(innerB.fetches.get === 1) // fetched itself, not served fromA
    assert(fromA.nonEmpty)
  }

  test("retry composes outside the cache: errors pass through, the retried success caches once") {
    CachingCardexApi.clear("s6"); nowMs = 0L
    val inner = new Counting(4, failFirst = true)
    val a = api(inner, "s6")
    val rows = CardexApi.fetchWithRetry(a, 1, 10, None, None, RetryConfig())
    assert(rows.toVector.size === 4)
    assert(inner.fetches.get === 2) // 1 transient failure + 1 success
    CardexApi.fetchWithRetry(a, 1, 10, None, None, RetryConfig()).toVector
    assert(inner.fetches.get === 2) // hit — no third delegate call
  }

  test("client-side key is byte-identical to the engine-level F20 expression") {
    val cases = Seq(
      (3, 100, Some("9000"), Some(20240101)),
      (1, 10, None, None),
      (7, 50, Some("B01"), None),
      // escaping parity: quote, backslash, tab in the bu value must hash
      // to the same bytes to_json emits for them
      (2, 20, Some("A\"B\\C\tD"), None))
    cases.foreach { case (page, rpp, bu, minDate) =>
      val expected = spark.range(1).select(
        CacheKey.derive(lit("cardex://fetch"), Seq(
          "page" -> lit(page),
          "rowsPerPage" -> lit(rpp),
          "bu" -> bu.map(lit(_)).getOrElse(lit(null).cast("string")),
          "minDate" -> minDate.map(lit(_)).getOrElse(lit(null).cast("int"))))
          .as("k")).head().getString(0)
      assert(CachingCardexApi.cacheKey(page, rpp, bu, minDate) === expected,
        s"key drift for ($page,$rpp,$bu,$minDate)")
    }
  }

  test("cacheTtlMs option wires the decorator through the DSv2 source") {
    CachingCardexApi.clear("opt-scope")
    InstrumentedCardexApi.reset()
    def read() = spark.read
      .format("graft.sources.rest.RestCardexSource")
      .option("apiClass", classOf[InstrumentedCardexApi].getName)
      .option("apiRunId", "opt-scope")
      .option("cacheTtlMs", "3600000")
      .option("pages", 2).option("rowsPerPage", 5)
      .load().collect()
    assert(read().length === 10)
    assert(read().length === 10)
    // 2 pages fetched once each; the second read is served from the memo
    assert(InstrumentedCardexApi.fetches.get === 2)
  }
}
