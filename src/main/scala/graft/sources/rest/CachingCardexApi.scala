package graft.sources.rest

import java.util.concurrent.ConcurrentHashMap

/** GET-response memo decorator for any [[CardexApi]] — the connector-side
  * analog of the reference wrapping every GET in `retry_request_lru`
  * (`/root/reference/backend/utility.py:275-334`): page fetches are
  * memoized under the SAME byte-format request-identity key as the
  * engine-level F20 expression ([[graft.functions.CacheKey]] —
  * `sha256(base_url || "||" || sorted-params-json || "||" || "{}")`),
  * with the reference's 1-hour TTL and its never-cache-empty rule
  * (utility.py:322-329).
  *
  * Scope of the mirror: this memo is a PROCESS-LOCAL cache (one per
  * executor JVM, like a connector's LRU), so unlike the durable
  * [[graft.state.ResultCache]] it does NOT reproduce the reference's
  * expired-tombstone quirk — an expired entry is simply replaced by the
  * next successful fetch. The durable store preserves that quirk
  * faithfully; at the connector layer it would only manufacture permanent
  * cache misses. `publishedPages` (the streaming watermark) and `sleep`
  * delegate uncached — memoizing the watermark would stall the stream.
  *
  * Composition order matters and is the reference's own:
  * `fetchWithRetry(CachingCardexApi(inner))` — the cache sits INSIDE the
  * retry loop exactly as `retry_request_lru` checks the cache before
  * delegating to `retry_request`, so rate-limit/transient errors pass
  * through uncached and a retried page that finally succeeds is cached
  * once. Enable from the option surface with `cacheTtlMs` (see
  * [[CardexApi.fromOptions]]).
  *
  * @param scope  cache namespace (parallel specs / independent sources);
  *               entries live in a JVM-wide map keyed by (scope, key)
  * @param clock  injectable for deterministic TTL specs
  */
final case class CachingCardexApi(
    inner: CardexApi, scope: String = "default",
    ttlMs: Long = CachingCardexApi.DefaultTtlMs,
    clock: () => Long = () => System.currentTimeMillis()) extends CardexApi {

  override def fetch(page: Int, rowsPerPage: Int, buParam: Option[String],
                     minDateParam: Option[Int]): Iterator[(String, String, Int, Double)] = {
    val key = (scope, CachingCardexApi.cacheKey(page, rowsPerPage, buParam, minDateParam))
    val now = clock()
    val cached = Option(CachingCardexApi.entries.get(key))
      .filter { case (storedAt, _) => now - storedAt <= ttlMs }
    cached match {
      case Some((_, rows)) => rows.iterator
      case None =>
        val rows = inner.fetch(page, rowsPerPage, buParam, minDateParam).toVector
        // never cache empty (utility.py:322-329); replace-on-expiry is the
        // documented divergence from the durable store's tombstone quirk
        if (rows.nonEmpty) CachingCardexApi.entries.put(key, (now, rows))
        rows.iterator
    }
  }

  override def publishedPages(default: Int): Int = inner.publishedPages(default)
  override def sleep(page: Int, ms: Long): Unit = inner.sleep(page, ms)
}

object CachingCardexApi {
  val DefaultTtlMs: Long = 3600000L // utility.py:515 INTERVAL '3600 seconds'
  private val BaseUrl = "cardex://fetch"

  private val entries =
    new ConcurrentHashMap[(String, String), (Long, Vector[(String, String, Int, Double)])]()

  /** The request-identity key, byte-identical to the F20 column expression
    * `CacheKey.derive(lit(BaseUrl), params)` over the same four params —
    * sorted keys (`bu`,`minDate`,`page`,`rowsPerPage`), string-coerced
    * values, nulls kept, compact JSON, sha256 lowercase hex. The
    * equivalence is pinned by a spec so client-side and engine-side keys
    * can never drift. */
  def cacheKey(page: Int, rowsPerPage: Int, buParam: Option[String],
               minDateParam: Option[Int]): String = {
    def j(v: Option[String]) = v.map("\"" + _ + "\"").getOrElse("null")
    val paramsJson =
      s"""{"bu":${j(buParam)},"minDate":${j(minDateParam.map(_.toString))}""" +
        s""","page":"$page","rowsPerPage":"$rowsPerPage"}"""
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s"$BaseUrl||$paramsJson||{}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Targeted invalidation — the post-write staleness hook
    * (utility.py:614-637). */
  def invalidate(scope: String, page: Int, rowsPerPage: Int,
                 buParam: Option[String], minDateParam: Option[Int]): Boolean =
    entries.remove((scope, cacheKey(page, rowsPerPage, buParam, minDateParam))) != null

  /** Drop a whole scope (spec isolation / source teardown). */
  def clear(scope: String): Unit =
    entries.keySet.removeIf(_._1 == scope)
}
