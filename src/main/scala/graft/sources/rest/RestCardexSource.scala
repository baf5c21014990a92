package graft.sources.rest

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** S2-S6 as a real DataSourceV2 (SURVEY.md §2.1/§4.2: "custom DataSourceV2
  * with filter pushdown if live REST federation is in scope"): the
  * reference polls a paged orchestrator REST API with query params
  * (`bu`, `rDate` lower bound, `size`) — that API surface is the injected
  * [[CardexApi]] client (default: the deterministic [[FakeCardexClient]];
  * a real HTTP impl plugs in via `.option("apiClass", ...)` with zero
  * reader changes), and the pushdown machinery is the real thing:
  *
  *  - `SupportsPushDownFilters`: `bu = x` / `rDate >= d` become "query
  *    params" — pages that cannot match are never fetched;
  *  - `SupportsPushDownRequiredColumns`: field selection at the source;
  *  - `SupportsPushDownLimit`: the reference's `size=` cap;
  *  - one `InputPartition` per API page -> fetches parallelize across
  *    executors instead of the reference's sequential driver loop.
  *
  * Usage: `spark.read.format("graft.sources.rest.RestCardexSource")
  *   .option("pages", 8).option("rowsPerPage", 1000).load()`.
  */
class RestCardexSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeCardexApi.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new CardexTable(
      api = CardexApi.fromOptions(properties),
      pages = opts.getInt("pages", 4),
      rowsPerPage = opts.getInt("rowsPerPage", 1000),
      maxPagesPerTrigger =
        Option(opts.get("maxPagesPerTrigger")).map(_.toInt),
      retry = RetryConfig(
        maxRetries = opts.getInt("maxRetries", 3),
        baseDelayMs = opts.getLong("baseDelayMs", 10L),
        defaultRateWaitMs = opts.getLong("defaultRateWaitMs", 10L)))
  }
}

/** Per-fetch retry policy, modeling the reference's two battle-tested
  * client behaviors (reference `backend/utility.py:382-400` and
  * `backend/bakery_ops_helper.py:277-281`):
  *
  *  - 429/423 rate limit: honor the server's `metadata.wait` hint when
  *    present, else a fixed default (the reference defaults to 10 s);
  *  - transient failure: exponential backoff `base * 2^attempt`;
  *  - both capped at `maxRetries` total retries per page fetch — past the
  *    cap the task FAILS (no silent data loss; Spark's own task retry is
  *    the next escalation level, and at 100 TB that is exactly where you
  *    want a poisoned page to surface, not as a missing partition).
  *
  * Delays are milliseconds here (the reference sleeps seconds) so specs
  * can exercise the real sleep path without real latency. The policy is
  * client-independent — the loop itself is [[CardexApi.fetchWithRetry]],
  * applied around whatever [[CardexApi]] the read injected. */
case class RetryConfig(maxRetries: Int = 3, baseDelayMs: Long = 10L,
                       defaultRateWaitMs: Long = 10L)

/** The canned "orchestrator API": deterministic pages of cardex rows.
  * Pages are date-ordered (like `sort=rDate:1`), so a pushed lower bound
  * lets whole pages be skipped — exactly how the reference's
  * `startEffectiveAt` param prunes server-side. */
object FakeCardexApi {
  val schema: StructType = StructType(Seq(
    StructField("item", StringType),
    StructField("bu", StringType),
    StructField("r_date", DateType),
    StructField("qty", DoubleType)))

  val baseDate = 19723 // 2024-01-01 as epoch days
  val datesPerPage = 2 // each page spans 2 days

  def pageMinDate(page: Int): Int = baseDate + page * datesPerPage

  // Server-side per-page attempt state + a log of every client sleep,
  // keyed by runId so concurrent specs don't interfere. JVM-wide is the
  // right scope for a fake server under local[n]; a real deployment's
  // state lives on the real server.
  private val attemptCounts = new java.util.concurrent.ConcurrentHashMap[(String, Int), Integer]()
  private val sleeps = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long)]()

  // Streaming-mode server state: how many pages the API has published so
  // far for a runId (the fake analog of "new cardex rows appeared since
  // the last poll"). Unset runIds fall back to the reader's `pages`
  // option, so batch reads are unaffected.
  private val published = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def publishPages(runId: String, n: Int): Unit = published.put(runId, n)
  def publishedPages(runId: String, default: Int): Int =
    Option(published.get(runId)).fold(default)(_.intValue)

  def attempts(runId: String, page: Int): Int =
    Option(attemptCounts.get((runId, page))).fold(0)(_.intValue)
  def sleepLog(runId: String): Seq[(Int, Long)] =
    sleeps.asScala.toSeq.collect { case (r, p, ms) if r == runId => (p, ms) }
  def resetRun(runId: String): Unit = {
    attemptCounts.keySet.removeIf(_._1 == runId)
    sleeps.removeIf(_._1 == runId)
  }

  /** The reader's sleeper — recorded so specs can assert the exact waits
    * (server-hint honoring, exponential ladder) without timing flakiness. */
  def sleep(runId: String, page: Int, ms: Long): Unit = {
    sleeps.add((runId, page, ms))
    Thread.sleep(ms)
  }

  /** failPlan grammar: `page:kind[:arg]` comma-separated.
    *   `2:transient:3` — page 2's first 3 fetches throw TransientError;
    *   `1:rate:57`     — page 1's first fetch rate-limits with wait hint 57 ms;
    *   `1:rate`        — same but the server sends NO wait hint;
    *   `4:poison`      — page 4 fails every fetch. */
  private def planFor(failPlan: String, page: Int): Option[(String, Option[Long])] =
    failPlan.split(",").iterator.map(_.trim).filter(_.nonEmpty).map(_.split(":"))
      .collectFirst { case parts if parts(0).toInt == page =>
        (parts(1), parts.lift(2).map(_.toLong)) }

  /** Fetch one page, applying the "query params" — and the failure plan,
    * page-granular like a real paged API (one bad page must not poison its
    * siblings). Counts attempts per (runId, page). */
  def fetch(page: Int, rowsPerPage: Int, buParam: Option[String],
            minDateParam: Option[Int], runId: String = "default",
            failPlan: String = ""): Iterator[(String, String, Int, Double)] = {
    val attempt = attemptCounts.merge((runId, page), 1, (a, b) => a + b).intValue
    planFor(failPlan, page).foreach {
      case ("transient", n) if attempt <= n.getOrElse(1L) =>
        throw CardexApi.TransientError(page)
      case ("rate", hint) if attempt <= 1 => throw CardexApi.RateLimited(hint)
      case ("poison", _) => throw CardexApi.PoisonedPage(page)
      case _ => ()
    }
    (0 until rowsPerPage).iterator.map { i =>
      val id = page * rowsPerPage + i
      val bu = Seq("1110", "1120", "1130")(id % 3)
      val date = pageMinDate(page) + (i % datesPerPage)
      (s"item${id % 97}", bu, date, (id % 50) + 0.25)
    }.filter { case (_, bu, d, _) =>
      buParam.forall(_ == bu) && minDateParam.forall(d >= _)
    }
  }
}

class CardexTable(api: CardexApi, pages: Int, rowsPerPage: Int,
                  maxPagesPerTrigger: Option[Int], retry: RetryConfig)
    extends Table with SupportsRead {
  override def name(): String = "graft_rest_cardex"
  override def schema(): StructType = FakeCardexApi.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CardexScanBuilder(api, pages, rowsPerPage, maxPagesPerTrigger, retry)
}

class CardexScanBuilder(api: CardexApi, pages: Int, rowsPerPage: Int,
                        maxPagesPerTrigger: Option[Int], retry: RetryConfig)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var requiredSchema: StructType = FakeCardexApi.schema
  private var pushedBu: Option[String] = None
  private var pushedMinDate: Option[Int] = None
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("bu", _: String) => true
      case GreaterThanOrEqual("r_date", _) => true
      case IsNotNull(_) => true // source never emits nulls
      case _ => false
    }
    accepted.foreach {
      case EqualTo("bu", v: String) => pushedBu = Some(v)
      case GreaterThanOrEqual("r_date", d: java.sql.Date) =>
        pushedMinDate = Some(d.toLocalDate.toEpochDay.toInt)
      case GreaterThanOrEqual("r_date", d: java.time.LocalDate) =>
        pushedMinDate = Some(d.toEpochDay.toInt)
      case _ => ()
    }
    pushed = accepted
    rejected // Spark re-evaluates these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def pushLimit(l: Int): Boolean = { limit = Some(l); false /* keep Spark's limit too */ }

  override def build(): Scan = new CardexScan(
    api, pages, rowsPerPage, requiredSchema, pushedBu, pushedMinDate, limit,
    maxPagesPerTrigger, retry)
}

class CardexScan(api: CardexApi, pages: Int, rowsPerPage: Int, required: StructType,
                 bu: Option[String], minDate: Option[Int], limit: Option[Int],
                 maxPagesPerTrigger: Option[Int], retry: RetryConfig)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"${api.getClass.getSimpleName}[pages=$pages, bu=$bu, minDate=$minDate, limit=$limit, cols=${required.fieldNames.mkString(",")}]"

  /** Page-level pruning: a pushed date bound skips whole pages — the
    * "server-side" filtering the reference got from query params. */
  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages)
      .filter(p => minDate.forall(_ < FakeCardexApi.pageMinDate(p) + FakeCardexApi.datesPerPage))
      .map(p => CardexPage(p, rowsPerPage, bu, minDate, limit, api, retry): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new CardexReaderFactory(required)

  /** Streaming mode: the source the reference's polling DAGs become. The
    * offset is "pages published by the API"; every trigger reads exactly
    * the pages in (lastCommitted, latest] — the incremental `rDate >=
    * last poll` fetch, but with Spark's checkpointed offset log supplying
    * the exactly-once bookkeeping the reference hand-rolled with its
    * status table. Pushdown (bu/date/columns) applies unchanged; a page
    * already consumed is NEVER re-fetched (asserted in
    * RestCardexStreamSpec via the API's attempt counters). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CardexMicroBatchStream(api, pages, rowsPerPage, required, bu, minDate,
      maxPagesPerTrigger, retry)
}

/** Offset = number of pages published (a monotone high-watermark, exactly
  * like a Kafka end-offset or a file-source's seen-files count). */
case class PageOffset(pages: Int) extends streaming.Offset {
  override def json(): String = pages.toString
}

class CardexMicroBatchStream(api: CardexApi, defaultPages: Int, rowsPerPage: Int,
                             required: StructType, bu: Option[String],
                             minDate: Option[Int],
                             maxPagesPerTrigger: Option[Int], retry: RetryConfig)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // Trigger.AvailableNow (the reference's catch-up scheduled-batch mode):
  // pin the end offset ONCE at query start so the run drains exactly the
  // pages published at that instant and terminates, even if the API keeps
  // publishing while the batch is running.
  @volatile private var availableNowCap: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(api.publishedPages(defaultPages))

  override def initialOffset(): streaming.Offset = PageOffset(0)
  override def latestOffset(): streaming.Offset =
    PageOffset(availableNowCap.getOrElse(api.publishedPages(defaultPages)))
  // SupportsAdmissionControl: pages are the admission unit. With
  // maxPagesPerTrigger set, each micro-batch admits at most that many new
  // pages (backpressure against a rate-limited API); the stream still
  // drains to the published watermark across successive triggers.
  // Trigger.AvailableNow ignores the cap by contract (it must reach the
  // offset pinned at prepare time).
  override def latestOffset(start: streaming.Offset,
                            limit: streaming.ReadLimit): streaming.Offset = {
    val target = availableNowCap.getOrElse(api.publishedPages(defaultPages))
    val capped = maxPagesPerTrigger match {
      case Some(cap) if availableNowCap.isEmpty =>
        math.min(target, start.asInstanceOf[PageOffset].pages + cap)
      case _ => target
    }
    PageOffset(capped)
  }
  override def deserializeOffset(json: String): streaming.Offset =
    PageOffset(json.toInt)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: streaming.Offset,
                                   end: streaming.Offset): Array[InputPartition] =
    (start.asInstanceOf[PageOffset].pages until end.asInstanceOf[PageOffset].pages)
      .filter(p => minDate.forall(_ < FakeCardexApi.pageMinDate(p) + FakeCardexApi.datesPerPage))
      .map(p => CardexPage(p, rowsPerPage, bu, minDate, None, api, retry): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new CardexReaderFactory(required)
}

/** One API page = one partition; carries the injected client to the
  * executor that fetches it. */
case class CardexPage(page: Int, rowsPerPage: Int, bu: Option[String],
                      minDate: Option[Int], limit: Option[Int],
                      api: CardexApi, retry: RetryConfig) extends InputPartition

class CardexReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CardexPage]
    new PartitionReader[InternalRow] {
      private val it = {
        val base = CardexApi.fetchWithRetry(
          p.api, p.page, p.rowsPerPage, p.bu, p.minDate, p.retry)
        p.limit.map(base.take).getOrElse(base)
      }
      private var current: (String, String, Int, Double) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = {
        val values = required.fieldNames.map {
          case "item" => UTF8String.fromString(current._1)
          case "bu" => UTF8String.fromString(current._2)
          case "r_date" => current._3
          case "qty" => current._4
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
