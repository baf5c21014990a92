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
  * executor JVM, like the reference's `lru_cache`), so unlike the durable
  * [[graft.state.ResultCache]] it does NOT reproduce the reference's
  * expired-tombstone quirk — an expired entry is simply replaced by the
  * next successful fetch. The durable store preserves that quirk
  * faithfully; at the connector layer it would only manufacture permanent
  * cache misses. Like the reference's LRU it is BOUNDED
  * ([[CachingCardexApi.MaxEntries]]): on overflow, expired entries are
  * swept first, then the oldest survivor is evicted — a streaming reader
  * minting a fresh (page, minDate) key every micro-batch cannot grow the
  * executor heap without bound. `publishedPages` (the streaming
  * watermark) and `sleep` delegate uncached — memoizing the watermark
  * would stall the stream.
  *
  * Entries are namespaced by `(scope, inner.clientId)`: two sources
  * sharing a JVM but backed by DIFFERENT clients (fake vs real HTTP, or
  * two fakes with different fail plans) must never serve each other's
  * rows, even under the default scope.
  *
  * Composition order matters and is the reference's own:
  * `fetchWithRetry(CachingCardexApi(inner))` — the cache sits INSIDE the
  * retry loop exactly as `retry_request_lru` checks the cache before
  * delegating to `retry_request`, so rate-limit/transient errors pass
  * through uncached and a retried page that finally succeeds is cached
  * once. Enable from the option surface with `cacheTtlMs` (see
  * [[CardexApi.fromOptions]]).
  *
  * @param scope  cache namespace (parallel specs / independent sources)
  * @param clock  injectable for deterministic TTL specs
  */
final case class CachingCardexApi(
    inner: CardexApi, scope: String = "default",
    ttlMs: Long = CachingCardexApi.DefaultTtlMs,
    clock: () => Long = () => System.currentTimeMillis()) extends CardexApi {

  /** The memo namespace — a (scope, clientId) TUPLE, not a joined string:
    * a scope containing the old join character could otherwise alias (or
    * be cleared as) another scope's prefix. The string form is
    * display-only. */
  def namespace: (String, String) = (scope, inner.clientId)

  private def keyOf(page: Int, rowsPerPage: Int, buParam: Option[String],
                    minDateParam: Option[Int]): (String, String, String) =
    (scope, inner.clientId,
      CachingCardexApi.cacheKey(page, rowsPerPage, buParam, minDateParam))

  override def fetch(page: Int, rowsPerPage: Int, buParam: Option[String],
                     minDateParam: Option[Int]): Iterator[(String, String, Int, Double)] = {
    val key = keyOf(page, rowsPerPage, buParam, minDateParam)
    val now = clock()
    val cached = Option(CachingCardexApi.entries.get(key))
      .filter(now <= _.expiresAt)
    cached match {
      case Some(e) => e.rows.iterator
      case None =>
        val rows = inner.fetch(page, rowsPerPage, buParam, minDateParam).toVector
        // never cache empty (utility.py:322-329); replace-on-expiry is the
        // documented divergence from the durable store's tombstone quirk
        if (rows.nonEmpty) CachingCardexApi.insert(key, now, rows, ttlMs)
        rows.iterator
    }
  }

  /** Targeted invalidation in THIS decorator's namespace — the post-write
    * staleness hook (utility.py:614-637). */
  def invalidate(page: Int, rowsPerPage: Int, buParam: Option[String],
                 minDateParam: Option[Int]): Boolean =
    CachingCardexApi.entries.remove(
      keyOf(page, rowsPerPage, buParam, minDateParam)) != null

  override def publishedPages(default: Int): Int = inner.publishedPages(default)
  override def sleep(page: Int, ms: Long): Unit = inner.sleep(page, ms)
}

object CachingCardexApi {
  val DefaultTtlMs: Long = 3600000L // utility.py:515 INTERVAL '3600 seconds'
  /** JVM-wide entry bound (the reference's lru_cache is bounded too). */
  val MaxEntries: Int = 1024
  private val BaseUrl = "cardex://fetch"

  /** A memo entry carries its OWN absolute expiry: the overflow sweep
    * evicts on each entry's expiry, never on the inserting decorator's
    * ttlMs — a short-TTL decorator sharing the JVM-wide map can therefore
    * never sweep another decorator's still-live long-TTL entries. */
  private final case class Entry(storedAt: Long, expiresAt: Long,
                                 rows: Vector[(String, String, Int, Double)])

  private val entries = new ConcurrentHashMap[(String, String, String), Entry]()

  private def insert(key: (String, String, String), now: Long,
                     rows: Vector[(String, String, Int, Double)], ttlMs: Long): Unit = {
    if (entries.size >= MaxEntries) {
      // sweep entries past their OWN expiry first; if the map is still
      // full, evict the oldest survivor
      entries.entrySet.removeIf(e => now > e.getValue.expiresAt)
      if (entries.size >= MaxEntries) {
        import scala.jdk.CollectionConverters._
        entries.entrySet.asScala.minByOption(_.getValue.storedAt)
          .foreach(oldest => entries.remove(oldest.getKey))
      }
    }
    entries.put(key, Entry(now, now + ttlMs, rows)); ()
  }

  /** JSON string-value escaping per the JSON spec — the exact byte forms
    * `to_json` (Jackson) emits, so hand-rolled params JSON cannot drift
    * from the F20 expression on quotes, backslashes, or control chars. */
  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\b' => "\\b"
    case '\f' => "\\f"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** The request-identity key, byte-identical to the F20 column expression
    * `CacheKey.derive(lit(BaseUrl), params)` over the same four params —
    * sorted keys (`bu`,`minDate`,`page`,`rowsPerPage`), string-coerced
    * values, nulls kept, compact JSON, sha256 lowercase hex. The
    * equivalence is pinned by a spec so client-side and engine-side keys
    * can never drift. */
  def cacheKey(page: Int, rowsPerPage: Int, buParam: Option[String],
               minDateParam: Option[Int]): String = {
    def j(v: Option[String]) = v.map("\"" + esc(_) + "\"").getOrElse("null")
    val paramsJson =
      s"""{"bu":${j(buParam)},"minDate":${j(minDateParam.map(_.toString))}""" +
        s""","page":"$page","rowsPerPage":"$rowsPerPage"}"""
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s"$BaseUrl||$paramsJson||{}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Drop every entry under `scope` (spec isolation / source teardown),
    * whatever client it was namespaced with. Exact tuple-component match:
    * no scope can be a string-prefix alias of another. */
  def clear(scope: String): Unit = {
    entries.keySet.removeIf(_._1 == scope); ()
  }
}
