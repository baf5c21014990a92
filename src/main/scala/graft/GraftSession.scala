package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession builder so every entry point (Verify, Bench, tests)
  * runs with identical, scale-aware settings.
  *
  * Design notes (100 TB target, tested on local[32]):
  *  - shuffle partitions default 32 to match local cores; on a real cluster
  *    this is overridden (AQE coalesces anyway).
  *  - AQE on: runtime re-planning (skew-join split, partition coalescing)
  *    is the main lever that survives a 1000x scale-up unchanged.
  *  - ANSI off: the reference's semantics are null-on-error coercion
  *    (pandas `to_numeric(errors="coerce")`, /root/reference/backend/main.py:197);
  *    permissive mode reproduces that and matches DuckDB TRY_CAST oracles.
  *  - Session TZ pinned UTC for date/timestamp parity with the oracle.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // size(NULL) = NULL (not the legacy -1): matches DuckDB len(NULL)
      // so null-text documents yield null stats everywhere instead of
      // -1-poisoned ratios, and generator bounds built from size() stay
      // null (emit nothing) rather than throwing on negative lengths.
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Session for local tools and tests. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
