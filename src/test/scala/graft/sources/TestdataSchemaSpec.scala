package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Testdata-schema drift tripwire (round-7 hardening).
  *
  * Round 6 lost 18 oracle queries because the driver regenerated
  * /root/testdata and events.ts silently changed physical encoding
  * (INT64 nanos -> parquet TIMESTAMP(MICROS)); the failure surfaced as 18
  * scattered analysis errors instead of one clear message. This spec reads
  * every table's SCANNED schema at sf0.001 and fails loudly, naming each
  * drifted column with observed-vs-accepted dtypes, so the next silent
  * regeneration produces exactly one diagnosable failure.
  *
  * Accepted sets (not exact pins) encode what the loaders genuinely
  * tolerate: Tables.events adapts to nanos-as-long AND native timestamps,
  * so all three encodings are legal there; a drift to anything else is a
  * real break.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val eventTs: Set[DataType] = ts + LongType // nanos-as-long legacy shape

  private def exact(cols: (String, DataType)*): Map[String, Set[DataType]] =
    cols.map { case (n, t) => n -> Set(t) }.toMap

  /** table -> (column -> accepted scanned dtypes). */
  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> exact("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> exact("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> exact("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> exact("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> exact("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> (exact("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType) + ("o_orderdate" -> ts)),
    "lineitem" -> (exact("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType)
      + ("l_shipdate" -> ts)),
    "events" -> (exact("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType) + ("ts" -> eventTs)),
    "documents" -> exact("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> exact("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("driver testdata schemas match what the loaders can adapt to") {
    val drifts = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val scanned = Tables.t(spark, sfSmoke, table).schema
      val byName = scanned.fields.map(f => f.name -> f.dataType).toMap
      val missing = cols.keySet.diff(byName.keySet).toSeq.sorted
        .map(c => s"$table.$c MISSING (accepted: ${cols(c).mkString(" | ")})")
      val wrong = cols.toSeq.sortBy(_._1).collect {
        case (c, accepted) if byName.contains(c) && !accepted.contains(byName(c)) =>
          s"$table.$c drifted to ${byName(c)} (accepted: ${accepted.mkString(" | ")})"
      }
      val extra = byName.keySet.diff(cols.keySet).toSeq.sorted
        .map(c => s"$table.$c APPEARED as ${byName(c)} (not in the expected schema)")
      missing ++ wrong ++ extra
    }
    assert(drifts.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT — the driver regenerated /root/testdata with " +
        s"a new physical schema.\nEach line below is one drifted column; fix " +
        s"the matching loader in graft.sources.Tables:\n  " + drifts.mkString("\n  "))
  }

  test("events loader adapts to BOTH encodings and agrees between them") {
    // the current testdata is all native-micros, so the nanos-as-long
    // branch would otherwise be dead code until the NEXT drift; this
    // fixture writes the same rows in both physical shapes and proves the
    // loader canonicalizes them identically (including the eventsSince
    // pushdown bound on each raw column type).
    // KNOWN APPROXIMATION: Spark cannot WRITE parquet TIMESTAMP(NANOS),
    // so the "nanos" fixture is a plain INT64 ts column — it exercises
    // decorateEvents' LongType branch (the post-scan canonicalization and
    // the long-literal pushdown), but NOT the nanosAsLong scan flag
    // itself. If the driver regenerates real TIMESTAMP(NANOS) testdata,
    // that scan path gets its first true coverage from the drift test
    // above plus the full oracle sweep, not from this fixture.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events-encodings").toFile
    try {
      val rowsNs = Seq(
        (1L, 1705276800000000000L, 10L, "view", 1.5, "{}"),
        (2L, 1705276800123456000L, 10L, "purchase", 2.5, "{}"),
        (3L, 1705190400000000000L, 11L, "view", 0.5, "{}")) // day before the bound
      rowsNs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/nanos/events.parquet")
      rowsNs.map { case (id, ns, u, et, v, p) =>
        (id, java.time.LocalDateTime.ofEpochSecond(
          ns / 1000000000L, (ns % 1000000000L).toInt, java.time.ZoneOffset.UTC), u, et, v, p)
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/micros/events.parquet")

      val fromNanos = Tables.events(spark, s"${dir.getAbsolutePath}/nanos")
        .select("event_id", "ts", "ts_ns").orderBy("event_id").collect().toSeq
      val fromMicros = Tables.events(spark, s"${dir.getAbsolutePath}/micros")
        .select("event_id", "ts", "ts_ns").orderBy("event_id").collect().toSeq
      assert(fromNanos === fromMicros,
        "the two physical encodings must canonicalize to identical rows")

      val bound = 1705276800000000000L
      val sinceNanos = Tables.eventsSince(spark, s"${dir.getAbsolutePath}/nanos", bound)
        .select("event_id").orderBy("event_id").collect().map(_.getLong(0)).toSeq
      val sinceMicros = Tables.eventsSince(spark, s"${dir.getAbsolutePath}/micros", bound)
        .select("event_id").orderBy("event_id").collect().map(_.getLong(0)).toSeq
      assert(sinceNanos === Seq(1L, 2L) && sinceMicros === Seq(1L, 2L),
        s"eventsSince bound must keep exactly ids 1,2 on both encodings " +
          s"(nanos=$sinceNanos micros=$sinceMicros)")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("Tables.events canonicalizes ts on every accepted encoding") {
    val df = Tables.events(spark, sfSmoke)
    assert(df.schema("ts").dataType === TimestampType,
      s"events.ts must canonicalize to TimestampType, got ${df.schema("ts").dataType}")
    assert(df.schema("ts_ns").dataType === LongType,
      s"events.ts_ns must be epoch-nanos LongType, got ${df.schema("ts_ns").dataType}")
    // ts and ts_ns must agree: ns is exactly the micros instant scaled up
    val bad = df.filter(
      org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000 != ts_ns")).count()
    assert(bad === 0L, s"$bad rows where ts_ns disagrees with ts")
  }
}
