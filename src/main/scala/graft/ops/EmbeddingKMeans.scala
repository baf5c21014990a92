package graft.ops

import graft.functions.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the coarse
  * quantizer behind semantic dedup (SemDeDup, Abbas et al. 2023) and IVF
  * index building. Reference scope: the reference system has no vector
  * operations at all; this is part of the training-data pipeline
  * extension (SURVEY.md §7.5).
  *
  * Scale design, in Spark terms:
  *  - **Assignment is row-local.** The k centroids travel as ONE broadcast
  *    array-of-structs row; each vector computes its nearest centroid with
  *    a sequential fold at the scan. No n×k row explosion, no shuffle, no
  *    window — the classic crossJoin+row_number formulation shuffles n×k
  *    rows on vec_id, which at 10⁹ vectors × k=50k is a non-starter.
  *  - **Recenter is a two-level hash aggregate.** posexplode fans each
  *    vector into (cluster, pos, x) rows, but the (cluster, pos) group key
  *    has only k×dims distinct values, so map-side partial aggregation
  *    collapses the shuffle to partitions × k × dims rows.
  *  - **Arithmetic is engine-reproducible.** Distances are strictly
  *    sequential double folds rounded to 6 dp before the argmin (ties →
  *    smallest centroid id); centroid means are EXACT DECIMAL(27,9) sums
  *    (addition order cannot drift across partitions or engines) divided
  *    in double and rounded to 6 dp. Every step is hash-comparable against
  *    an unrolled SQL oracle.
  */
object EmbeddingKMeans {

  /** Squared L2 distance between two DOUBLE arrays: strictly sequential
    * left fold, rounded to 6 dp (same parity discipline as
    * [[Vectors.cosine]]). */
  def sqDist(a: Column, b: Column): Column =
    round(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x), 6)

  /** One Lloyd assignment pass. `vectors` = (vec_id, v: array<double>),
    * `centroids` = (cid, cv: array<double>); returns
    * (vec_id, cluster, v, dist).
    *
    * The centroid frame is collapsed to a single cid-sorted array row and
    * broadcast; the argmin is a fold with strict '<' over that array, so
    * ties go to the smallest centroid id — exactly `ROW_NUMBER() OVER
    * (ORDER BY dist, cid) = 1`. Distances are computed once per centroid
    * (the transform materializes (dist, cid) pairs before the fold — HOF
    * lambdas get no common-subexpression elimination). */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val packed = centroids.agg(
      array_sort(collect_list(struct(col("cid"), col("cv")))).as("__cents"))
    val scored = transform(col("__cents"), c =>
      struct(sqDist(col("v"), c.getField("cv")).as("dist"),
        c.getField("cid").as("cid")))
    val best = aggregate(
      scored,
      struct(lit(Double.MaxValue).as("dist"), lit(-1L).as("cid")),
      (acc, p) => when(p.getField("dist") < acc.getField("dist"), p)
        .otherwise(acc))
    vectors.crossJoin(broadcast(packed))
      .withColumn("__best", best)
      .select(col("vec_id"), col("__best").getField("cid").as("cluster"),
        col("v"), col("__best").getField("dist").as("dist"))
  }

  /** Element-wise centroid means with ORDER-INDEPENDENT arithmetic: each
    * coordinate rounds into DECIMAL(27,9) (exact addition — no float
    * summation-order drift), sums combine map-side on the k×dims-sized
    * (cluster, pos) key, and the mean divides in double, rounded to 6 dp.
    * Returns (cid, cv) for the next [[assign]] pass. */
  def recenter(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(round(sum(col("col").cast("decimal(27,9)")).cast("double")
        / count(lit(1)), 6).as("m"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("cv"))
      .select(col("cluster").as("cid"), col("cv"))

  /** Deterministic k-means fit: seeds are the vectors with `vec_id < k`
    * (the same "first k vectors" convention as the IVF coarse quantizer in
    * `ann_ivf_cells`), then `iters` assignment passes with a recenter
    * between each. Returns the final (vec_id, cluster, v, dist). */
  def fit(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val vectors = embeddings.select(col("vec_id"),
      Vectors.toDouble(col("embedding")).as("v"))
    val seeds = vectors.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    (1 until iters).foldLeft(assign(vectors, seeds))(
      (a, _) => assign(vectors, recenter(a)))
  }
}
