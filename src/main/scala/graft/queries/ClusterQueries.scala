package graft.queries

import graft.functions.Vectors
import graft.ops.EmbeddingKMeans
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Embedding clustering + semantic dedup (training-data pipeline
  * extension): deterministic Lloyd's k-means as the coarse quantizer, and
  * SemDeDup-style within-cluster semantic duplicate removal on top of it.
  *
  * Scale design: k-means assignment is row-local (broadcast packed
  * centroids, fold-argmin at the scan — see [[graft.ops.EmbeddingKMeans]]);
  * the SemDeDup pairwise cosine is confined within clusters, and k is the
  * knob that bounds it — SemDeDup's own recipe scales k with the corpus
  * (50k clusters for LAION) precisely so |cluster| ≈ n/k stays constant.
  */
object ClusterQueries {

  private val K = 8
  private val SemDedupTau = 0.9

  /** DuckDB twin of [[EmbeddingKMeans.sqDist]]. */
  private def duckSqDist(a: String, b: String): String =
    s"round(list_sum(list_transform(list_zip($a, $b), x -> (x[1]-x[2])*(x[1]-x[2]))), 6)"

  /** DuckDB twin of [[Vectors.cosine]] (same text as SimilarityQueries). */
  private def duckCos(a: String, b: String): String =
    s"""round(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2]))
       |  / (sqrt(list_sum(list_transform($a, x -> x * x)))
       |     * sqrt(list_sum(list_transform($b, x -> x * x)))), 6)""".stripMargin

  /** Shared unrolled-Lloyd CTE chain: seeds (vec_id < K) → assignment a1 →
    * decimal-exact recenter c1 → assignment a2. Both queries' oracles
    * append their final SELECT to this. */
  private val kmeansCtes =
    s"""WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM b WHERE vec_id < $K),
       |a1 AS (
       |  SELECT vec_id, cid AS cluster, v, dist FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                                 ORDER BY dist, cid) AS rn FROM (
       |      SELECT b.vec_id, c0.cid, b.v,
       |             ${duckSqDist("b.v", "c0.cv")} AS dist
       |      FROM b, c0))
       |  WHERE rn = 1),
       |m1 AS (
       |  SELECT cluster, idx,
       |         round(CAST(SUM(CAST(v[idx] AS DECIMAL(27,9))) AS DOUBLE)
       |               / COUNT(*), 6) AS m
       |  FROM a1, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS idx)
       |  GROUP BY cluster, idx),
       |c1 AS (SELECT cluster AS cid, list(m ORDER BY idx) AS cv
       |       FROM m1 GROUP BY cluster),
       |a2 AS (
       |  SELECT vec_id, cid AS cluster, v, dist FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                                 ORDER BY dist, cid) AS rn FROM (
       |      SELECT b.vec_id, c1.cid, b.v,
       |             ${duckSqDist("b.v", "c1.cv")} AS dist
       |      FROM b, c1))
       |  WHERE rn = 1)""".stripMargin

  val qs: Seq[Q] = Seq(
    Q(
      "emb_kmeans",
      s"""Deterministic Lloyd's k-means over the embedding table: k=$K seeds
         |(vec_id < $K), two assignment passes with one decimal-exact
         |recenter between them. Assignment is row-local (broadcast packed
         |centroids, fold-argmin with round-6 squared-L2, ties to the
         |smallest centroid id); the centroid update sums DECIMAL(27,9) so
         |the mean is identical whatever order partitions combine in. The
         |oracle unrolls both iterations as CTEs — a hash match proves the
         |entire two-round fixpoint arithmetic, not just the final labels.
         |""".stripMargin,
      Some(
        s"""$kmeansCtes
           |SELECT vec_id, cluster, dist FROM a2 ORDER BY vec_id""".stripMargin),
      (s, dir) =>
        EmbeddingKMeans.fit(Tables.embeddings(s, dir), K, iters = 2)
          .select("vec_id", "cluster", "dist")
          .orderBy("vec_id")),

    Q(
      "dd_semdedup",
      s"""SemDeDup semantic dedup (Abbas et al. 2023): k-means clusters as
         |the blocking structure, then a document is a semantic duplicate
         |iff some SMALLER-id member of its cluster has cosine ≥
         |$SemDedupTau with it (greedy keep-first, fully deterministic).
         |Output: per vector its cluster, the max cosine to any smaller-id
         |cluster-mate, and the keep verdict. The pairwise term is bounded
         |by |cluster| ≈ n/k — k grows with the corpus, the per-cluster
         |work does not. Scale adjudication (r16): the catalog pins k=8
         |for oracle determinism, so on an N× replica the within-cluster
         |pair term n²/2k grows quadratically BY CONSTRUCTION — measured
         |eff 1.63 at 10× / 1.94 at 20× (SCALECURVE20_SEMDEDUP_r16.json),
         |on scalecurve's expected list alongside the geo density trio.
         |The 100 TB path is SemDeDup's own recipe, k ∝ corpus size;
         |ScaleStress.semdedupStress measures that knob (pairs and wall
         |time ∝ 1/k, pinned in ScaleStressSpec).""".stripMargin,
      Some(
        s"""$kmeansCtes,
           |p AS (
           |  SELECT x.vec_id, MAX(${duckCos("x.v", "y.v")}) AS max_prior_cos
           |  FROM a2 x JOIN a2 y
           |    ON x.cluster = y.cluster AND y.vec_id < x.vec_id
           |  GROUP BY x.vec_id)
           |SELECT a2.vec_id, a2.cluster, p.max_prior_cos,
           |       (p.max_prior_cos IS NULL OR p.max_prior_cos < $SemDedupTau) AS keep
           |FROM a2 LEFT JOIN p ON a2.vec_id = p.vec_id
           |ORDER BY a2.vec_id""".stripMargin),
      (s, dir) => {
        // the <= self-join keeps the diagonal pair, so EVERY vector owns a
        // group and the oracle's join-back is a conditional max instead —
        // one fewer recompute of the (exchange-free, thus non-reusable)
        // k-means subtree
        val a2 = EmbeddingKMeans.fit(Tables.embeddings(s, dir), K, iters = 2)
        val x = a2.select(col("vec_id"), col("cluster"), col("v"))
        val y = a2.select(col("vec_id").as("y_id"), col("cluster"),
          col("v").as("yv"))
        x.join(y, Seq("cluster"))
          .filter(col("y_id") <= col("vec_id"))
          .groupBy("vec_id", "cluster")
          .agg(max(when(col("y_id") < col("vec_id"),
            Vectors.cosine(col("v"), col("yv")))).as("max_prior_cos"))
          .withColumn("keep",
            col("max_prior_cos").isNull || col("max_prior_cos") < SemDedupTau)
          .select("vec_id", "cluster", "max_prior_cos", "keep")
          .orderBy("vec_id")
      }),

    Q(
      "ann_ivf_kmeans",
      """IVF search over a k-means-REFINED coarse quantizer: the index
        |build is the emb_kmeans fixpoint (two Lloyd passes instead of
        |ann_ivf_cells' raw first-8-vectors quantizer — tighter cells,
        |better recall at the same probe cost), and the search restricts
        |each probe to its own cell exactly as in ann_ivf_cells. Probes
        |10..19, top-3 per cell by round-6 cosine, ties to the smaller
        |candidate id. The composition is the point: index construction
        |and search are the same two oracle-checked operators chained.""".stripMargin,
      Some(
        s"""$kmeansCtes,
           |probes AS (
           |  SELECT vec_id AS probe_id, cluster, v AS pv FROM a2
           |  WHERE vec_id >= 10 AND vec_id < 20),
           |scored AS (
           |  SELECT probe_id, a.vec_id AS cand_id, probes.cluster AS cluster,
           |         ${duckCos("pv", "a.v")} AS cos
           |  FROM probes JOIN a2 a
           |    ON probes.cluster = a.cluster AND a.vec_id <> probe_id)
           |SELECT probe_id, cand_id, cluster, cos, rn FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
           |                               ORDER BY cos DESC, cand_id) AS rn
           |  FROM scored)
           |WHERE rn <= 3
           |ORDER BY probe_id, rn""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val a2 = EmbeddingKMeans.fit(Tables.embeddings(s, dir), K, iters = 2)
        val probes = a2.filter(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").as("probe_id"), col("cluster"),
            col("v").as("pv"))
        val w = Window.partitionBy("probe_id")
          .orderBy(col("cos").desc, col("cand_id"))
        a2.select(col("vec_id").as("cand_id"), col("cluster"), col("v").as("cv"))
          .join(broadcast(probes), Seq("cluster"))
          .filter(col("cand_id") =!= col("probe_id"))
          .withColumn("cos", Vectors.cosine(col("pv"), col("cv")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("probe_id", "cand_id", "cluster", "cos", "rn")
          .orderBy("probe_id", "rn")
      }))
}
