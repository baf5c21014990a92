package graft.ops

import graft.ops.Lineage._
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed near-duplicate detector — MinHash/LSH candidate generation
  * followed by row-local exact-Jaccard confirmation — shared verbatim by
  * the oracle-checked catalog query (`dd_lsh_confirm`) and the end-to-end
  * [[graft.pipelines.DedupPipeline]], so the pipeline cannot drift from
  * what the driver verifies.
  *
  * Scale shape (the reason this is THE 100 TB near-dup path): signatures
  * are row-local folds over per-doc shingle sets; band collisions generate
  * a candidate set bounded by real collisions (never all-pairs); both
  * confirm joins broadcast the candidate-derived side, so the corpus is
  * scanned once and never shuffled.
  */
object NearDup {
  /** Confirmed near-dup pairs `(doc_a < doc_b, n_inter, jaccard)` at
    * `threshold`. Signatures and confirm both run over `shingleSize`-word
    * shingles (shingle space is large enough that collisions mean real
    * similarity; unigram minhash saturates on a bounded vocabulary). The
    * result is EAGERLY materialized (localCheckpoint) — it is
    * collision-sized — so the corpus-scale shingle cache is released
    * before the frame is handed back.
    *
    * `maxBandGroup`: candidate generation is quadratic IN THE BAND GROUP
    * (an m-member collision emits m(m-1)/2 pairs), so one pathological
    * hot band — boilerplate headers, templated spam — can dominate the
    * whole job. The cap drops bands larger than the bound before pairing
    * (the standard LSH-at-scale guard: a band shared by thousands of
    * documents carries no similarity signal worth m² work; the exact
    * norm-key path still catches true duplicates inside it). None = no
    * cap, exactly the oracle-checked `dd_lsh_confirm` semantics.
    *
    * `hintBroadcast`: the confirm joins hint the candidate-derived side
    * as the broadcast build (default). The hinted side carries the
    * per-doc hashed sets, so its bytes are candidates × avg set size —
    * collision-sized at every measured scale, but a HINT is
    * unconditional: past Spark's broadcast ceiling (8 GB) or driver
    * memory the job would die rather than degrade. `hintBroadcast =
    * false` strips both hints and lets the planner/AQE pick: the same
    * joins run as shuffled hash/sort-merge on candidate keys —
    * row-identical output, proven by StrategyInvarianceSpec (the same
    * executed-flip proof j5 carries). That is the 100 TB degradation
    * path: flip this flag (or let AQE re-plan small builds back to
    * broadcast at runtime) when the candidate set outgrows the ceiling.
    */
  def confirmedPairs(documents: DataFrame, shingleSize: Int = 3,
                     nSeeds: Int = 8, bandSize: Int = 4,
                     threshold: Double = 0.5,
                     maxBandGroup: Option[Int] = None,
                     hintBroadcast: Boolean = true): DataFrame = {
    val (confirmed, base) = confirmPlan(documents, shingleSize, nSeeds,
      bandSize, threshold, maxBandGroup, hintBroadcast)
    // materialize the (tiny) confirmed set NOW so the corpus-sized
    // shingle cache can be dropped before this frame is handed back — a
    // bare persist would otherwise pin it for the rest of the session
    // (Verify/Bench share one SparkSession)
    val out = confirmed.cutLineage(true)
    base.unpersist()
    out
  }

  /** The un-checkpointed confirm frame plus the persisted shingle base —
    * exposed so StrategyInvarianceSpec can inspect the JOIN plan (the
    * public method's localCheckpoint erases lineage). Callers own
    * unpersisting the returned base after materializing the frame.
    */
  private[graft] def confirmPlan(documents: DataFrame, shingleSize: Int = 3,
                                 nSeeds: Int = 8, bandSize: Int = 4,
                                 threshold: Double = 0.5,
                                 maxBandGroup: Option[Int] = None,
                                 hintBroadcast: Boolean = true): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.GraftColumnBridge
    def minHash(seed: Int) =
      array_min(transform(col("toks"), h => md5(concat(lit(s"$seed|"), h)))).as(s"h$seed")
    // per-shingle md5 computed ONCE and cached: the signature branch
    // (seed-mins) and the confirm branch (sorted hashed sets) both read
    // this frame, and without the cache Spark recomputes the shingle+md5
    // pass once per branch. Par.spread first: the corpus arrives as one
    // scan split (single-row-group testdata), which would run the whole
    // shingle+md5 fold single-threaded (guide §2.5 unsplittable-input
    // repartition; width is size-derived, see Par)
    val base = Par.spread(documents)
      .withColumn("ws", Text.tokens(col("text")))
      .filter(size(col("ws")) >= shingleSize)
      .withColumn("toks", array_distinct(
        transform(Text.shinglesOfTokens(col("ws"), shingleSize), sh => md5(sh))))
      .select("doc_id", "toks")
      .persist()
    val sig = base.select(col("doc_id") +: (0 until nSeeds).map(minHash): _*)
    val band0 = md5(concat((0 until bandSize).map(i => col(s"h$i")): _*))
    val band1 = md5(concat((bandSize until nSeeds).map(i => col(s"h$i")): _*))
    // both band keys in ONE projection over sig, exploded to two rows —
    // the union-of-two-selects form evaluated the 8 per-doc minhash folds
    // (8 md5s per shingle) TWICE, once per union branch (guide §1.2 step
    // 2 / the CollapseProject gotcha: each branch re-inlines the sig
    // expressions). The two keys read disjoint halves of the signature,
    // so this projection still evaluates each fold exactly once.
    val allBands = sig.select(col("doc_id"), explode(array(
        struct(lit(0).as("band_id"), band0.as("band_key")),
        struct(lit(1).as("band_id"), band1.as("band_key")))).as("b"))
      .select(col("doc_id"), col("b.band_id").as("band_id"),
        col("b.band_key").as("band_key"))
    // hot-band guard: count members per band ONCE (a key-sized agg) and
    // drop over-cap groups before the quadratic pairing step
    val bands = maxBandGroup match {
      case None => allBands
      case Some(cap) =>
        import org.apache.spark.sql.expressions.Window
        allBands
          .withColumn("__n", count(lit(1)).over(
            Window.partitionBy("band_id", "band_key")))
          .filter(col("__n") <= cap)
          .drop("__n")
    }
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // per-doc hashed sorted sets: the row-local confirm input (the same
    // form dd_ngram_jaccard intersects)
    val sets = base.select(col("doc_id"),
      array_sort(transform(col("toks"), t => xxhash64(t))).as("th"))
      .withColumn("n", size(col("th")))
    val a = sets.select(col("doc_id").as("doc_a"), col("th").as("th_a"), col("n").as("n_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("th").as("th_b"), col("n").as("n_b"))
    // BOTH joins keep the candidate-derived side as the broadcast build:
    // the outer hint re-marks the (cand ⋈ a) result, which is still
    // candidate-sized — without it the second join broadcasts the
    // corpus-sized sets table instead. With hints stripped the planner
    // shuffles both joins on their doc keys — the proven degradation
    // path for a candidate set past the broadcast ceiling.
    def hinted(df: DataFrame) = if (hintBroadcast) broadcast(df) else df
    val paired = hinted(hinted(cand).join(a, "doc_a")).join(b, "doc_b")
      .withColumn("n_inter", GraftColumnBridge.column(
        graft.plans.SortedIntersectCountExpression(
          GraftColumnBridge.expression(col("th_a")),
          GraftColumnBridge.expression(col("th_b")))).cast("long"))
    val jac = col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))
    val confirmed = paired
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), round(jac, 6).as("jaccard"))
    (confirmed, base)
  }
}
