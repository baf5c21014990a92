package graft.sources.rest

import java.util

/** The injectable client boundary of the cardex DSv2 source (SURVEY.md
  * §2.1): everything protocol-shaped — pagination, query params, the
  * 429/transient failure surface — lives behind this trait, so the reader
  * machinery ([[CardexReaderFactory]], [[CardexMicroBatchStream]]) is
  * written once and deploys against either the deterministic in-JVM fake
  * ([[FakeCardexClient]], the spec default) or a real HTTP client, chosen
  * per-read via the `apiClass` option. The retry policy deliberately does
  * NOT live in implementations: [[CardexApi.fetchWithRetry]] wraps any
  * client with the reference's battle-tested ladder
  * (`/root/reference/backend/utility.py:382-400` rate-limit wait hints,
  * `backend/bakery_ops_helper.py:277-281` bounded exponential backoff), so
  * a swapped-in client cannot accidentally drop it.
  *
  * Instances ride inside [[CardexPage]] input partitions to executors —
  * hence `Serializable`. Implementations must be cheap to serialize
  * (config only; open connections belong in lazy/transient fields).
  */
trait CardexApi extends Serializable {
  /** Fetch one page, applying the pushed "query params". May throw
    * [[CardexApi.RateLimited]] / [[CardexApi.TransientError]] (retryable —
    * [[CardexApi.fetchWithRetry]] handles them) or anything else
    * (non-retryable: the task fails loudly, no silent data loss). */
  def fetch(page: Int, rowsPerPage: Int, buParam: Option[String],
            minDateParam: Option[Int]): Iterator[(String, String, Int, Double)]

  /** Streaming high-watermark: how many pages the server has published.
    * `default` is the reader's `pages` option (batch reads and servers
    * with no publish feed fall back to it). */
  def publishedPages(default: Int): Int

  /** The retry loop's sleeper. Overridable so specs can record the exact
    * waits (server-hint honoring, exponential ladder) without timing
    * flakiness; production impls keep the default. */
  def sleep(page: Int, ms: Long): Unit = Thread.sleep(ms)

  /** Stable configuration identity — [[CachingCardexApi]] namespaces its
    * memo by this, so two sources backed by different clients (or the
    * same client class configured differently) never serve each other's
    * cached rows. Default: the class name (stable across instances,
    * distinct across implementations); override with a config-bearing
    * string when one class serves multiple distinct backends. */
  def clientId: String = getClass.getName
}

object CardexApi {
  /** 429/423 with the server's `metadata.wait` hint (None = the server
    * sent no hint — the reference then falls back to a fixed default). */
  final case class RateLimited(waitMs: Option[Long])
      extends RuntimeException(s"429 rate limited (wait=$waitMs)")

  /** 5xx-ish transient failure: retryable with client-side backoff. */
  final case class TransientError(page: Int)
      extends RuntimeException(s"503 transient failure on page $page")

  /** Non-retryable failure (the reference raises after logging). */
  final case class PoisonedPage(page: Int)
      extends RuntimeException(s"400 permanently failing page $page")

  /** Client retry loop around [[CardexApi.fetch]] — the engine analog of
    * the reference's `retry_request` (`backend/utility.py:382-400`:
    * 429/423 honor `metadata.wait`, else a fixed default) with the bounded
    * exponential ladder of `backend/bakery_ops_helper.py:277-281`
    * (`base * 2^attempt`, capped retries, raise past the cap — Spark's own
    * task retry is the next escalation level, and at 100 TB that is
    * exactly where a poisoned page should surface, not as a silently
    * missing partition). */
  def fetchWithRetry(api: CardexApi, page: Int, rowsPerPage: Int,
                     buParam: Option[String], minDateParam: Option[Int],
                     retry: RetryConfig): Iterator[(String, String, Int, Double)] = {
    var attempt = 0
    while (true) {
      try {
        return api.fetch(page, rowsPerPage, buParam, minDateParam)
      } catch {
        case RateLimited(hint) if attempt < retry.maxRetries =>
          api.sleep(page, hint.getOrElse(retry.defaultRateWaitMs))
          attempt += 1
        case TransientError(_) if attempt < retry.maxRetries =>
          api.sleep(page, retry.baseDelayMs << attempt)
          attempt += 1
        // past the cap (or non-retryable): propagate — fail loudly
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Build the client a read will use. `apiClass` names any
    * [[CardexApi]] implementation with a `(java.util.Map[String,String])`
    * or no-arg constructor — the full option map is handed to the former,
    * so an implementation configures itself from the same `.option(...)`
    * surface as the source. Unset, the deterministic fake is used (specs,
    * local smoke). `cacheTtlMs` (> 0) wraps whichever client was built in
    * the [[CachingCardexApi]] GET memo — the reference's
    * `retry_request_lru` composition, opt-in per read. Option names are
    * case-insensitive, matching every other option of this source. */
  def fromOptions(properties: util.Map[String, String]): CardexApi = {
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(properties)
    val base = Option(opts.get("apiClass")) match {
      case None =>
        FakeCardexClient(
          runId = Option(opts.get("apiRunId")).getOrElse("default"),
          failPlan = Option(opts.get("failPlan")).getOrElse(""))
      case Some(cls) =>
        val c = Class.forName(cls)
        val byMap = c.getConstructors.find(
          _.getParameterTypes.sameElements(Array(classOf[util.Map[String, String]])))
        byMap match {
          case Some(ctor) =>
            ctor.newInstance(new util.HashMap[String, String](properties))
              .asInstanceOf[CardexApi]
          case None =>
            c.getDeclaredConstructor().newInstance().asInstanceOf[CardexApi]
        }
    }
    Option(opts.get("cacheTtlMs")).map(_.toLong).filter(_ > 0) match {
      case Some(ttl) =>
        CachingCardexApi(base, scope =
          Option(opts.get("apiRunId")).getOrElse("default"), ttlMs = ttl)
      case None => base
    }
  }
}

/** The spec/default implementation: a thin serializable handle onto the
  * JVM-wide [[FakeCardexApi]] "server" (attempt counters, publish
  * watermark, sleep log — keyed by `runId` so concurrent specs don't
  * interfere). Carries only its two config strings across serialization;
  * the server state never leaves the JVM, like a real server's wouldn't.
  */
final case class FakeCardexClient(runId: String = "default",
                                  failPlan: String = "") extends CardexApi {
  override def fetch(page: Int, rowsPerPage: Int, buParam: Option[String],
                     minDateParam: Option[Int]): Iterator[(String, String, Int, Double)] =
    FakeCardexApi.fetch(page, rowsPerPage, buParam, minDateParam, runId, failPlan)

  override def publishedPages(default: Int): Int =
    FakeCardexApi.publishedPages(runId, default)

  /** Recorded sleeps — specs assert the exact wait ladder. */
  override def sleep(page: Int, ms: Long): Unit =
    FakeCardexApi.sleep(runId, page, ms)

  /** Config-bearing identity: two fakes with different runId/failPlan are
    * different backends and must not share a cache namespace. */
  override def clientId: String = s"FakeCardexClient($runId,$failPlan)"
}
