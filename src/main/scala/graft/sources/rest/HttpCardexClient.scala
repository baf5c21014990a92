package graft.sources.rest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.io.IOException
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets
import java.util

/** A real-HTTP [[CardexApi]] — the production twin of
  * [[FakeCardexClient]], plugged in per-read via
  * `.option("apiClass", "graft.sources.rest.HttpCardexClient")
  *  .option("baseUrl", "http://host:port")`.
  *
  * Wire protocol (the reference's paged orchestrator surface,
  * `/root/reference/backend/bakery_ops_helper.py:256-295`: GET with
  * `page`/`size` plus the pushed query params; JSON body; 429/423 carry a
  * `metadata.wait` hint the client honors,
  * `/root/reference/backend/utility.py:382-400`):
  *
  *  - `GET {baseUrl}/cardex?page=P&size=N[&bu=X][&minDate=D]` →
  *    `{"rows": [["item","bu",epochDay,qty], ...]}`. `bu`/`minDate` are
  *    the pushed filters — the server prunes, the client never
  *    re-fetches what the scan already excluded.
  *  - `GET {baseUrl}/published` → `{"pages": N}` (streaming
  *    high-watermark); any error falls back to the reader's `pages`
  *    option, like a server with no publish feed.
  *
  * Failure mapping feeds [[CardexApi.fetchWithRetry]]'s ladder exactly
  * like the fake: HTTP 429/423 → [[CardexApi.RateLimited]] with the
  * server's `metadata.wait` (absent → None → the client-side default
  * wait); HTTP 5xx → [[CardexApi.TransientError]] (exponential backoff);
  * any IOException — connect/read timeout, connection reset, a body cut
  * mid-stream — is ALSO transient (a partial page is re-fetched whole,
  * never half-consumed: the body is read fully before a single row is
  * parsed); any other HTTP status → [[CardexApi.PoisonedPage]]
  * (non-retryable — fails the task loudly, Spark's task retry is the
  * next escalation level). Past `maxRetries` the last transient error
  * propagates, so a dead or hanging server surfaces as a loud task
  * failure, not missing rows — RestCardexHttpSpec drives every one of
  * these paths over a real socket.
  *
  * Serialization: carries only its three config values to executors (the
  * connection is opened per fetch — HTTP keep-alive pooling happens in
  * the JVM's internal connection cache, keyed by host).
  */
final class HttpCardexClient(baseUrl: String, connectTimeoutMs: Int,
                             readTimeoutMs: Int) extends CardexApi {
  def this(options: util.Map[String, String]) = this(
    baseUrl = {
      val v = new org.apache.spark.sql.util.CaseInsensitiveStringMap(options).get("baseUrl")
      require(v != null, "HttpCardexClient requires .option(\"baseUrl\", ...)")
      v.stripSuffix("/")
    },
    connectTimeoutMs = new org.apache.spark.sql.util.CaseInsensitiveStringMap(options)
      .getInt("connectTimeoutMs", 2000),
    readTimeoutMs = new org.apache.spark.sql.util.CaseInsensitiveStringMap(options)
      .getInt("readTimeoutMs", 10000))

  override def clientId: String = s"HttpCardexClient($baseUrl)"

  override def fetch(page: Int, rowsPerPage: Int, buParam: Option[String],
                     minDateParam: Option[Int]): Iterator[(String, String, Int, Double)] = {
    val params = Seq(s"page=$page", s"size=$rowsPerPage") ++
      buParam.map(b => s"bu=${URLEncoder.encode(b, StandardCharsets.UTF_8)}") ++
      minDateParam.map(d => s"minDate=$d")
    val body = get(s"$baseUrl/cardex?${params.mkString("&")}", page)
    val rows = HttpCardexClient.mapper.readTree(body).path("rows")
    if (!rows.isArray)
      throw new IOException(s"malformed cardex page $page: no rows array")
    val it = rows.elements()
    new Iterator[(String, String, Int, Double)] {
      override def hasNext: Boolean = it.hasNext
      override def next(): (String, String, Int, Double) = {
        val r: JsonNode = it.next()
        (r.get(0).asText(), r.get(1).asText(), r.get(2).asInt(), r.get(3).asDouble())
      }
    }
  }

  override def publishedPages(default: Int): Int =
    try HttpCardexClient.mapper.readTree(get(s"$baseUrl/published", page = -1))
      .path("pages").asInt(default)
    catch { case _: Exception => default }

  /** One GET, full body materialized before returning — a connection cut
    * mid-body throws HERE (IOException → transient → whole-page retry),
    * never after rows started flowing into the scan. */
  private def get(url: String, page: Int): String = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    try {
      val code =
        try conn.getResponseCode
        catch { case e: IOException => throw wrapTransient(e, page) }
      code match {
        case 200 =>
          try {
            val bytes = conn.getInputStream.readAllBytes()
            // HttpURLConnection can surface a connection cut mid-body as a
            // plain short read instead of an IOException — enforce the
            // announced Content-Length ourselves so a truncated page is
            // retried whole, never parsed as a short-but-valid page
            val announced = conn.getContentLengthLong
            if (announced >= 0 && bytes.length != announced)
              throw new IOException(
                s"truncated body: got ${bytes.length} of $announced bytes")
            new String(bytes, StandardCharsets.UTF_8)
          } catch { case e: IOException => throw wrapTransient(e, page) }
        case 429 | 423 =>
          val hint = try {
            val err = Option(conn.getErrorStream)
              .map(s => new String(s.readAllBytes(), StandardCharsets.UTF_8))
            err.flatMap { b =>
              val n = HttpCardexClient.mapper.readTree(b).path("metadata").path("wait")
              if (n.isNumber) Some(n.asLong) else None
            }
          } catch { case _: Exception => None }
          throw CardexApi.RateLimited(hint)
        case s if s >= 500 =>
          Option(conn.getErrorStream).foreach(_.readAllBytes()) // drain for keep-alive
          throw CardexApi.TransientError(page)
        case _ =>
          Option(conn.getErrorStream).foreach(_.readAllBytes())
          throw CardexApi.PoisonedPage(page)
      }
    } finally conn.disconnect()
  }

  private def wrapTransient(e: IOException, page: Int): Throwable = {
    val t = CardexApi.TransientError(page)
    t.initCause(e)
    t
  }
}

object HttpCardexClient {
  private[rest] val mapper = new ObjectMapper()
}
