package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector operations over `ArrayType(FloatType)` columns
  * (training-data pipeline extension: similarity search / near-dup).
  *
  * All arithmetic runs in DOUBLE with a strictly sequential left fold
  * (`aggregate`), which makes results bit-reproducible for a given element
  * order — required for oracle comparison and for deterministic dedup
  * decisions across cluster re-runs. No UDFs; these are Catalyst
  * higher-order-function expressions evaluated row-local (no shuffle).
  */
object Vectors {
  /** Cast a float array to double BEFORE arithmetic so both engines round
    * identically (float32 -> float64 widening is exact). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to 6 dp to absorb engine-side ulp noise in
    * the divide/sqrt tail (sums themselves are order-stable). Production
    * path is the fused native expression (one pass, no intermediate
    * arrays); [[cosineBuiltins]] is the declarative twin it is
    * bit-equivalence-tested against. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.CosineSimilarityExpression(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** The same cosine as pure built-in expressions. */
  def cosineBuiltins(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Bounded top-k aggregate (score DESC, id ASC on ties): keeps the k
    * best (score, id) pairs per group with map-side partial combine —
    * the shuffle carries answers, not candidates, unlike the
    * row_number-window form. See [[graft.plans.TopKByScoreAggregate]]. */
  def topKByScore(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.plans.TopKByScoreAggregate(
        GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
  }

  /** Coordinate-hyperplane LSH bucket: the sign pattern of the embedding at
    * the given (1-based) dimensions, as a bit string. Deterministic,
    * engine-independent, and computable at the scan — the scale path for
    * ANN: candidates co-partition by bucket, so the expensive cosine runs
    * only within buckets. */
  def signBucket(v: Column, dims: Seq[Int]): Column =
    concat(dims.map(d => when(element_at(v, d) >= 0, "1").otherwise("0")): _*)
}
