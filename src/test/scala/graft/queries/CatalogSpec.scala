package graft.queries

import graft.SparkSpec

/** Catalog-wide invariants + smoke execution of every query at sf0.001.
  * The sf0.01 DuckDB hash-compare is the driver's gate; this suite catches
  * breakage earlier and cheaper. */
class CatalogSpec extends SparkSpec {

  test("catalog names are unique and non-empty") {
    assert(Catalog.all.nonEmpty)
    assert(Catalog.all.map(_.name).distinct.size === Catalog.all.size)
  }

  test("every catalog query carries a DuckDB oracle (no silent rows-only checks)") {
    val missing = Catalog.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("every query runs at sf0.001 and returns a stable schema") {
    Catalog.all.foreach { q =>
      val df = q.build(spark, sfSmoke)
      val n = df.count()
      withClue(s"query ${q.name}: ") {
        assert(n >= 0)
        assert(df.columns.nonEmpty)
        assert(df.columns.distinct.length === df.columns.length,
          s"duplicate output columns in ${q.name}")
      }
    }
  }

  test("flagship entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every Bench headline name resolves to a catalog query") {
    // Bench filters the scale-curve subset with headline.contains — a
    // renamed or removed query would otherwise SILENTLY shrink the 10x
    // evidence set instead of failing anything
    val stale = graft.Bench.headline -- Catalog.all.map(_.name).toSet
    assert(stale.isEmpty, s"Bench.headline names not in catalog: $stale")
  }

  test("every catalog query's final schema is scalar-only (driver-sortable)") {
    // The driver's oracle harness sorts/hashes results with pandas, which
    // cannot sort array/map/struct columns (round-7's one red row,
    // emb_avg_pool, failed exactly this way). Catalog queries must emit
    // long-form rows or a deterministic string rendering instead; keep
    // array-valued variants under ScalaTest specs.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    Catalog.all.foreach { q =>
      val bad = q.build(spark, sfSmoke).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType]
          || f.dataType.isInstanceOf[StructType] => f.name
      }
      assert(bad.isEmpty, s"query ${q.name} emits non-scalar columns: ${bad.mkString(",")}")
    }
  }
}
