package graft.sources.rest

import java.util
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** A second, instrumented [[CardexApi]] implementation — proof that the
  * client seam is injectable: the DSv2 reader machinery must run untouched
  * against it, the pushed query params must arrive at ITS `fetch`, and the
  * shared retry ladder ([[CardexApi.fetchWithRetry]]) must wrap it exactly
  * as it wraps the default fake. Constructed by the source via reflection
  * from the `apiClass` option, receiving the full option map — the same
  * wiring a real HTTP client would use. */
final class InstrumentedCardexApi(options: util.Map[String, String]) extends CardexApi {
  private val tag = Option(options.get("instrumentTag")).getOrElse("inj")
  private val failFirst = Option(options.get("failFirstFetch")).exists(_.toBoolean)

  override def fetch(page: Int, rowsPerPage: Int, buParam: Option[String],
                     minDateParam: Option[Int]): Iterator[(String, String, Int, Double)] = {
    val n = InstrumentedCardexApi.fetches.incrementAndGet()
    InstrumentedCardexApi.params.add((page, buParam, minDateParam))
    if (failFirst && n == 1) throw CardexApi.TransientError(page)
    (0 until rowsPerPage).iterator.map { i =>
      (s"$tag-$page-$i", "9000", FakeCardexApi.pageMinDate(page), i.toDouble)
    }.filter { case (_, bu, d, _) =>
      buParam.forall(_ == bu) && minDateParam.forall(d >= _)
    }
  }

  override def publishedPages(default: Int): Int = default

  /** Record instead of sleeping — the waits are asserted, not suffered. */
  override def sleep(page: Int, ms: Long): Unit =
    InstrumentedCardexApi.sleeps.add((page, ms))
}

object InstrumentedCardexApi {
  val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
  val params = new ConcurrentLinkedQueue[(Int, Option[String], Option[Int])]()
  val sleeps = new ConcurrentLinkedQueue[(Int, Long)]()
  def reset(): Unit = { fetches.set(0); params.clear(); sleeps.clear() }
}

class CardexApiInjectionSpec extends SparkSpec {

  private def src(extra: (String, String)*): DataFrame = {
    val base = spark.read
      .format("graft.sources.rest.RestCardexSource")
      .option("apiClass", classOf[InstrumentedCardexApi].getName)
      .option("pages", 3).option("rowsPerPage", 10)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("reflected client serves the read end-to-end (no reader changes)") {
    InstrumentedCardexApi.reset()
    val rows = src().collect()
    assert(rows.length === 30)
    // every row demonstrably came from the injected impl, fetched once per page
    assert(rows.forall(_.getAs[String]("item").startsWith("inj-")))
    assert(InstrumentedCardexApi.fetches.get === 3)
  }

  test("option map reaches the injected client's constructor") {
    InstrumentedCardexApi.reset()
    val rows = src("instrumentTag" -> "probe").collect()
    assert(rows.forall(_.getAs[String]("item").startsWith("probe-")))
  }

  test("pushed query params arrive at the injected client's fetch") {
    InstrumentedCardexApi.reset()
    src("pages" -> "6").filter(col("bu") === "9000" &&
      col("r_date") >= lit("2024-01-05")).collect()
    val seen = InstrumentedCardexApi.params.asScala.toSeq
    assert(seen.nonEmpty)
    // the bu equality and date lower bound were pushed, not engine-side
    assert(seen.forall { case (_, bu, min) =>
      bu.contains("9000") && min.contains(19727) })
    // and page-level pruning still applied above the client: pages 0-1
    // (2024-01-01..04) were never fetched
    assert(seen.map(_._1).distinct.sorted === Seq(2, 3, 4, 5))
  }

  test("the shared retry ladder wraps the injected client") {
    InstrumentedCardexApi.reset()
    val rows = src("failFirstFetch" -> "true", "baseDelayMs" -> "7").collect()
    assert(rows.length === 30) // the failed fetch was retried, not dropped
    assert(InstrumentedCardexApi.fetches.get === 4) // 3 pages + 1 retry
    // backoff consulted the client's sleeper with the configured base
    assert(InstrumentedCardexApi.sleeps.asScala.toSeq.map(_._2) === Seq(7L))
  }
}
