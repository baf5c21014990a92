package graft.sources.rest

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
  * (`bu`, `rDate` lower bound, `size`) — here that API surface is modeled
  * by [[FakeCardexApi]] (a deterministic in-executor stand-in; swap it for
  * an HTTP client and nothing else changes), and the pushdown machinery is
  * the real thing:
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
      pages = opts.getInt("pages", 4),
      rowsPerPage = opts.getInt("rowsPerPage", 1000))
  }
}

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

  /** Fetch one page, applying the "query params". */
  def fetch(page: Int, rowsPerPage: Int, buParam: Option[String],
            minDateParam: Option[Int]): Iterator[(String, String, Int, Double)] =
    (0 until rowsPerPage).iterator.map { i =>
      val id = page * rowsPerPage + i
      val bu = Seq("1110", "1120", "1130")(id % 3)
      val date = pageMinDate(page) + (i % datesPerPage)
      (s"item${id % 97}", bu, date, (id % 50) + 0.25)
    }.filter { case (_, bu, d, _) =>
      buParam.forall(_ == bu) && minDateParam.forall(d >= _)
    }
}

class CardexTable(pages: Int, rowsPerPage: Int) extends Table with SupportsRead {
  override def name(): String = "graft_rest_cardex"
  override def schema(): StructType = FakeCardexApi.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CardexScanBuilder(pages, rowsPerPage)
}

class CardexScanBuilder(pages: Int, rowsPerPage: Int)
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
    pages, rowsPerPage, requiredSchema, pushedBu, pushedMinDate, limit)
}

class CardexScan(pages: Int, rowsPerPage: Int, required: StructType,
                 bu: Option[String], minDate: Option[Int], limit: Option[Int])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FakeCardexApi[pages=$pages, bu=$bu, minDate=$minDate, limit=$limit, cols=${required.fieldNames.mkString(",")}]"

  /** Page-level pruning: a pushed date bound skips whole pages — the
    * "server-side" filtering the reference got from query params. */
  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages)
      .filter(p => minDate.forall(_ < FakeCardexApi.pageMinDate(p) + FakeCardexApi.datesPerPage))
      .map(p => CardexPage(p, rowsPerPage, bu, minDate, limit): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new CardexReaderFactory(required)
}

case class CardexPage(page: Int, rowsPerPage: Int, bu: Option[String],
                      minDate: Option[Int], limit: Option[Int]) extends InputPartition

class CardexReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CardexPage]
    new PartitionReader[InternalRow] {
      private val it = {
        val base = FakeCardexApi.fetch(p.page, p.rowsPerPage, p.bu, p.minDate)
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
