package graft.queries

import graft.ops.Lineage._
import graft.functions.Vectors
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (training-data pipeline
  * extension): brute-force cosine top-k as the correctness baseline, a
  * coordinate-hyperplane LSH bucketed variant as the scale path, and
  * embedding near-dup as label-blocked nearest neighbor.
  *
  * Scale design: brute-force broadcasts the (small) probe set so the
  * candidate scan never shuffles; LSH co-partitions probe and candidate by
  * bucket so the pairwise cosine work drops by the bucket fan-out (256 here)
  * while the bucket join stays an equi shuffle; near-dup blocks on `label`
  * exactly like the Jaccard dedup blocks on `source`.
  */
object SimilarityQueries {

  private val lshDims = Seq(1, 9, 17, 25, 33, 41, 49, 57)

  // ---- product-quantization internals (emb_pq_encode, ann_pq_adc) ----
  // 64 dims -> 4 subspaces x 16 dims, 8-centroid codebooks seeded from the
  // first 8 vectors' subvectors (the emb_kmeans/ann_ivf_cells seed rule).

  /** One-row codebook: `cb` = 32 arrays of 16 doubles, ordered (m*8+k). */
  private def pqCodebook(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("k"), Vectors.toDouble(col("embedding")).as("sv"))
      .crossJoin(broadcast(s.range(0, 4).select(col("id").as("m"))))
      .select((col("m") * 8 + col("k")).as("idx"),
        expr("slice(sv, cast(m*16+1 as int), 16)").as("cv"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("idx"), col("cv")))).as("sc"))
      .select(expr("transform(sc, x -> x.cv)").as("cb"))

  /** The 4x8 subspace distance table (j-ascending double folds —
    * identical IEEE order on both engines). NOTE: reference this
    * expression exactly ONCE per projection — CollapseProject duplicates
    * a multiply-referenced higher-order expression into every use site
    * (no common-subexpression elimination in lambda trees), which turned
    * the first cut of emb_pq_encode into a 14x recompute (64 s at sf0.1
    * in the bench). */
  private val pqDistExpr =
    """transform(sequence(0, 3), m -> transform(sequence(0, 7), k ->
      |  aggregate(sequence(1, 16), CAST(0.0 AS DOUBLE), (a, j) -> a +
      |    (element_at(v, m*16+j) - element_at(element_at(cb, m*8+k+1), j)) *
      |    (element_at(v, m*16+j) - element_at(element_at(cb, m*8+k+1), j)))))"""
      .stripMargin

  /** Per-subspace argmin as ONE self-contained fold: array of 4 structs
    * (bk = code, bd = its squared distance). The per-(m,k) distance is
    * textually inlined twice (compare + assign — SQL lambdas have no
    * let-binding), a bounded 2x, unlike the unbounded duplication a
    * cross-projection `ds` reference costs. Init bd = +Inf, strict <
    * keeps the smaller code on ties. */
  private val pqCodeExpr =
    """transform(sequence(0, 3), m -> aggregate(sequence(0, 7),
      |  named_struct('bk', -1, 'bd', CAST('Infinity' AS DOUBLE)),
      |  (acc, k) -> IF(
      |    aggregate(sequence(1, 16), CAST(0.0 AS DOUBLE), (a, j) -> a +
      |      (element_at(v, m*16+j) - element_at(element_at(cb, m*8+k+1), j)) *
      |      (element_at(v, m*16+j) - element_at(element_at(cb, m*8+k+1), j)))
      |      < acc.bd,
      |    named_struct('bk', k,
      |      'bd', aggregate(sequence(1, 16), CAST(0.0 AS DOUBLE), (a, j) -> a +
      |        (element_at(v, m*16+j) - element_at(element_at(cb, m*8+k+1), j)) *
      |        (element_at(v, m*16+j) - element_at(element_at(cb, m*8+k+1), j)))),
      |    acc)))""".stripMargin

  /** Vectors joined with the broadcast codebook — the base both PQ
    * queries project their single-use expressions from. */
  private def pqBase(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(pqCodebook(s, dir)))

  /** The shared oracle CTE prefix producing `codes(vec_id, ds, cs)`. */
  private val pqOracleCtes =
    """seeds AS (
      |  SELECT vec_id AS k, embedding::DOUBLE[] AS sv
      |  FROM embeddings WHERE vec_id < 8),
      |cbl AS (
      |  SELECT m.m * 8 + s.k AS idx,
      |         s.sv[CAST(m.m*16+1 AS INTEGER):CAST(m.m*16+16 AS INTEGER)] AS cv
      |  FROM range(0, 4) m(m) CROSS JOIN seeds s),
      |cb AS (SELECT list(cv ORDER BY idx) AS cb FROM cbl),
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |enc AS (
      |  SELECT vec_id,
      |    list_transform(range(0, 4), m ->
      |      list_transform(range(0, 8), k ->
      |        list_reduce(list_transform(range(1, 17), j ->
      |          (v[CAST(m*16+j AS INTEGER)] - cb[CAST(m*8+k+1 AS INTEGER)][CAST(j AS INTEGER)])
      |        * (v[CAST(m*16+j AS INTEGER)] - cb[CAST(m*8+k+1 AS INTEGER)][CAST(j AS INTEGER)])),
      |          (a, b) -> a + b))) AS ds
      |  FROM e, cb),
      |codes AS (
      |  SELECT vec_id, ds,
      |    list_transform(range(0, 4), m ->
      |      list_reduce(range(0, 8), (bk, k) ->
      |        CASE WHEN ds[CAST(m+1 AS INTEGER)][CAST(k+1 AS INTEGER)]
      |                  < ds[CAST(m+1 AS INTEGER)][CAST(bk+1 AS INTEGER)]
      |             THEN k ELSE bk END)) AS cs
      |  FROM enc)""".stripMargin

  /** DuckDB-side cosine between two DOUBLE[] exprs, rounded like
    * [[Vectors.cosine]]. */
  private def duckCos(a: String, b: String): String =
    s"""round(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2]))
       |  / (sqrt(list_sum(list_transform($a, x -> x * x)))
       |     * sqrt(list_sum(list_transform($b, x -> x * x)))), 6)""".stripMargin

  val qs: Seq[Q] = Seq(
    Q(
      "emb_prefix_fidelity",
      """Matryoshka-style truncation fidelity — the eval an embedding-ops
        |pipeline runs before shipping shortened vectors (MRL prefixes,
        |cheap first-stage retrieval): for prefix dims 8/16/32 of the
        |64-d embeddings, how often does prefix-cosine top-1 agree with
        |full-vector top-1 over the probe set? One scored frame serves
        |every prefix (dims explode from a 4-row broadcast; cosine runs
        |on array slices row-locally), rankings are per-(dim, probe)
        |windows, and the final agreement aggregate is probe-sized. The
        |full-dim run rides the same frame as its own control — its
        |agreement is 10^6 ppm by construction, pinning the harness.""".stripMargin,
      Some(
        s"""WITH probes AS (
           |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
           |  FROM embeddings WHERE vec_id < 10),
           |cands AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
           |          FROM embeddings WHERE vec_id >= 10),
           |dims AS (SELECT unnest([8, 16, 32, 64]) AS d),
           |scored AS (
           |  SELECT d, probe_id, cand_id,
           |         ${duckCos("list_slice(pv, 1, d)", "list_slice(cv, 1, d)")} AS cos
           |  FROM probes, cands, dims),
           |best AS (
           |  SELECT d, probe_id, cand_id FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY d, probe_id
           |                                 ORDER BY cos DESC, cand_id) AS rn
           |    FROM scored) WHERE rn = 1),
           |full64 AS (SELECT probe_id, cand_id AS full_cand FROM best WHERE d = 64)
           |SELECT b.d AS prefix_dim,
           |       CAST(COUNT(*) AS BIGINT) AS n_probes,
           |       CAST(COUNT(*) FILTER (WHERE b.cand_id = f.full_cand) AS BIGINT)
           |         AS n_agree,
           |       CAST(COUNT(*) FILTER (WHERE b.cand_id = f.full_cand) * 1000000
           |            // COUNT(*) AS BIGINT) AS agree_ppm
           |FROM best b JOIN full64 f USING (probe_id)
           |GROUP BY 1
           |ORDER BY prefix_dim""".stripMargin),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"),
            Vectors.toDouble(col("embedding")).as("pv"))
        val cands = emb.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("cand_id"),
            Vectors.toDouble(col("embedding")).as("cv"))
        val dims = probes.sparkSession.range(0, 1)
          .select(explode(array(lit(8), lit(16), lit(32), lit(64))).as("d"))
        val scored = cands
          .crossJoin(broadcast(probes))
          .crossJoin(broadcast(dims))
          .select(col("d"), col("probe_id"), col("cand_id"),
            Vectors.cosineBuiltins(
              expr("slice(pv, 1, d)"), expr("slice(cv, 1, d)")).as("cos"))
        val w = Window.partitionBy("d", "probe_id")
          .orderBy(col("cos").desc, col("cand_id"))
        // materialize best (dims x probes rows) once: `full` re-derived
        // it otherwise — the d=64 partition of the window (and its slice
        // of the cosine pass) was computed a second time for the join's
        // broadcast side
        val best = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("d", "probe_id", "cand_id")
          .cutLineage(true)
        val full = best.filter(col("d") === 64)
          .select(col("probe_id"), col("cand_id").as("full_cand"))
        best.join(broadcast(full), "probe_id")
          .groupBy(col("d").as("prefix_dim"))
          .agg(
            count(lit(1)).as("n_probes"),
            sum(when(col("cand_id") === col("full_cand"), 1L).otherwise(0L))
              .as("n_agree"))
          .withColumn("agree_ppm", expr("n_agree * 1000000 div n_probes"))
          .orderBy("prefix_dim")
      }),

    Q(
      "emb_mips",
      """Maximum-inner-product search via the NORM-AUGMENTATION reduction
        |(Neyshabur & Srebro) — the trick that lets cosine/L2 ANN
        |infrastructure serve recommendation-style MIPS queries: append
        |sqrt(M^2 - |x|^2) to every candidate (M = max candidate norm,
        |ONE broadcast scalar) and 0 to the probe; every augmented
        |candidate then has norm exactly M, so cosine ranking in the
        |augmented space equals inner-product ranking in the original.
        |The query runs BOTH searches — direct dot-product top-1 and
        |augmented-space cosine top-1 — and emits them side by side with
        |an agreement flag, so the oracle hash-compare pins the reduction
        |end to end (disagreement is possible only inside the 1e-6
        |rounding quantum; the flag carries that truth rather than
        |asserting it away). Candidate scan stays shuffle-free (probes
        |and M broadcast); both rankings are per-probe windows over the
        |same scored frame.""".stripMargin,
      Some(
        s"""WITH probes AS (
           |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
           |  FROM embeddings WHERE vec_id < 5),
           |cands AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
           |          FROM embeddings WHERE vec_id >= 5),
           |m2 AS (
           |  SELECT MAX(list_sum(list_transform(cv, x -> x * x))) AS mm
           |  FROM cands),
           |scored AS (
           |  SELECT probe_id, cand_id,
           |         round(list_sum(list_transform(list_zip(pv, cv),
           |                 x -> x[1] * x[2])), 6) AS ip,
           |         ${duckCos("list_append(pv, 0.0)",
                       "list_append(cv, sqrt(mm - list_sum(list_transform(cv, x -> x * x))))")}
           |           AS aug_cos
           |  FROM probes, cands, m2),
           |rk AS (
           |  SELECT *,
           |         ROW_NUMBER() OVER (PARTITION BY probe_id
           |                            ORDER BY ip DESC, cand_id) AS r_ip,
           |         ROW_NUMBER() OVER (PARTITION BY probe_id
           |                            ORDER BY aug_cos DESC, cand_id) AS r_cos
           |  FROM scored),
           |best AS (
           |  SELECT a.probe_id,
           |         a.cand_id AS mips_cand, a.ip AS mips_dot,
           |         b.cand_id AS aug_cand, b.aug_cos
           |  FROM rk a JOIN rk b
           |    ON a.probe_id = b.probe_id AND a.r_ip = 1 AND b.r_cos = 1)
           |SELECT probe_id, mips_cand, mips_dot, aug_cand, aug_cos,
           |       CAST(CASE WHEN mips_cand = aug_cand THEN 1 ELSE 0 END AS INT)
           |         AS agree
           |FROM best
           |ORDER BY probe_id""".stripMargin),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val probes = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"),
            Vectors.toDouble(col("embedding")).as("pv"))
        val cands = emb.filter(col("vec_id") >= 5)
          .select(col("vec_id").as("cand_id"),
            Vectors.toDouble(col("embedding")).as("cv"))
        val m2 = cands.agg(max(Vectors.dot(col("cv"), col("cv"))).as("mm"))
        val scored = cands
          .crossJoin(broadcast(probes))
          .crossJoin(broadcast(m2))
          .select(col("probe_id"), col("cand_id"),
            round(Vectors.dot(col("pv"), col("cv")), 6).as("ip"),
            Vectors.cosineBuiltins(
              concat(col("pv"), array(lit(0.0))),
              concat(col("cv"),
                array(sqrt(col("mm") - Vectors.dot(col("cv"), col("cv"))))))
              .as("aug_cos"))
        val wIp = Window.partitionBy("probe_id")
          .orderBy(col("ip").desc, col("cand_id"))
        val wCos = Window.partitionBy("probe_id")
          .orderBy(col("aug_cos").desc, col("cand_id"))
        val rk = scored
          .withColumn("r_ip", row_number().over(wIp))
          .withColumn("r_cos", row_number().over(wCos))
        rk.filter(col("r_ip") === 1)
          .select(col("probe_id"), col("cand_id").as("mips_cand"),
            col("ip").as("mips_dot"))
          .join(rk.filter(col("r_cos") === 1)
            .select(col("probe_id"), col("cand_id").as("aug_cand"),
              col("aug_cos")), "probe_id")
          .select(col("probe_id"), col("mips_cand"), col("mips_dot"),
            col("aug_cand"), col("aug_cos"),
            when(col("mips_cand") === col("aug_cand"), 1).otherwise(0)
              .cast("int").as("agree"))
          .orderBy("probe_id")
      }),

    Q(
      "ann_bruteforce_topk",
      """Brute-force cosine top-k: 10 probe vectors against the full
        |candidate set, top-5 each. The probe side is broadcast, so the
        |candidate scan is shuffle-free; ranking is a per-probe window over
        |the scored pairs. Cosine rounds to 6 dp BEFORE ranking so the
        |tiebreak (cand id) is engine-stable.""".stripMargin,
      Some(
        s"""WITH probes AS (
           |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
           |  FROM embeddings WHERE vec_id < 10),
           |cands AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv FROM embeddings),
           |scored AS (
           |  SELECT probe_id, cand_id, ${duckCos("pv", "cv")} AS cos
           |  FROM probes, cands
           |  WHERE cand_id <> probe_id)
           |SELECT probe_id, cand_id, cos, rn FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
           |                               ORDER BY cos DESC, cand_id) AS rn
           |  FROM scored)
           |WHERE rn <= 5
           |ORDER BY probe_id, rn""".stripMargin),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
        val cands = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
        val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
        cands.crossJoin(broadcast(probes))
          .filter(col("cand_id") =!= col("probe_id"))
          .withColumn("cos", Vectors.cosine(col("pv"), col("cv")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("probe_id", "cand_id", "cos", "rn")
          .orderBy("probe_id", "rn")
      }),

    Q(
      "ann_topk_agg",
      """Same answer as ann_bruteforce_topk, computed with the native
        |bounded top-k AGGREGATE instead of a row_number window: each map
        |task keeps at most k candidates per probe in a primitive-array
        |heap, partial buffers merge, and the shuffle carries k x |probes|
        |rows instead of |probes| x |candidates| — the form that survives
        |millions of candidates per probe. Oracle is the identical window
        |SQL, so the hash compare doubles as the aggregate's
        |bit-equivalence proof.""".stripMargin,
      Some(
        s"""WITH probes AS (
           |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
           |  FROM embeddings WHERE vec_id < 10),
           |cands AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv FROM embeddings),
           |scored AS (
           |  SELECT probe_id, cand_id, ${duckCos("pv", "cv")} AS cos
           |  FROM probes, cands
           |  WHERE cand_id <> probe_id)
           |SELECT probe_id, cand_id, cos, rn FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
           |                               ORDER BY cos DESC, cand_id) AS rn
           |  FROM scored)
           |WHERE rn <= 5
           |ORDER BY probe_id, rn""".stripMargin),
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
        val cands = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
        cands.crossJoin(broadcast(probes))
          .filter(col("cand_id") =!= col("probe_id"))
          .select(col("probe_id"), col("cand_id"),
            Vectors.cosine(col("pv"), col("cv")).as("cos"))
          .groupBy("probe_id")
          .agg(Vectors.topKByScore(col("cos"), col("cand_id"), 5).as("top"))
          .select(col("probe_id"), posexplode(col("top")))
          .select(
            col("probe_id"),
            col("col.id").as("cand_id"),
            col("col.score").as("cos"),
            (col("pos") + 1).cast("int").as("rn"))
          .orderBy("probe_id", "rn")
      }),

    Q(
      "ann_lsh_bucketed",
      """LSH-bucketed ANN: coordinate-hyperplane sign bucket over 8 fixed
        |dimensions (256 buckets), candidates restricted to the probe's
        |bucket, top-3 within bucket. Same probes as brute-force, so recall
        |vs the exact answer is directly inspectable. The bucket is computed
        |at the scan; probe-candidate matching is an equi-join on it.""".stripMargin,
      Some {
        val duckBucket = lshDims
          .map(d => s"CASE WHEN embedding[$d] >= 0 THEN '1' ELSE '0' END")
          .mkString(" || ")
        s"""WITH b AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS v, ($duckBucket) AS bucket
           |  FROM embeddings),
           |probes AS (SELECT vec_id AS probe_id, v AS pv, bucket FROM b WHERE vec_id < 10),
           |scored AS (
           |  SELECT probe_id, b.vec_id AS cand_id, probes.bucket AS bucket,
           |         ${duckCos("pv", "b.v")} AS cos
           |  FROM probes JOIN b ON probes.bucket = b.bucket AND b.vec_id <> probe_id)
           |SELECT probe_id, cand_id, bucket, cos, rn FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
           |                               ORDER BY cos DESC, cand_id) AS rn
           |  FROM scored)
           |WHERE rn <= 3
           |ORDER BY probe_id, rn""".stripMargin
      },
      (s, dir) => {
        val b = Tables.embeddings(s, dir).select(
          col("vec_id"), col("embedding"),
          Vectors.signBucket(col("embedding"), lshDims).as("bucket"))
        val probes = b.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding").as("pv"), col("bucket"))
        val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
        b.select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("bucket"))
          .join(broadcast(probes), Seq("bucket"))
          .filter(col("cand_id") =!= col("probe_id"))
          .withColumn("cos", Vectors.cosine(col("pv"), col("cv")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("probe_id", "cand_id", "bucket", "cos", "rn")
          .orderBy("probe_id", "rn")
      }),

    Q(
      "ann_recall_eval",
      """ANN RECALL evaluation — the metric that decides whether an
        |approximate index ships: per probe, the LSH-bucketed top-5 is
        |scored against the brute-force top-5 ground truth
        |(recall@5), from ONE shared scored frame — the brute ranking
        |runs over all candidates, the bucketed ranking over the
        |same-bucket subset of the very same rows, so the eval costs one
        |brute pass (exactly what an offline recall job pays). Output
        |per probe: the bucket's candidate count, hits, and recall in
        |ppm — small buckets expose the recall/bucket-size trade the
        |index tuner actually navigates. Probes broadcast; everything
        |after scoring is top-k-frame-sized.""".stripMargin,
      Some {
        val duckBucket = lshDims
          .map(d => s"CASE WHEN embedding[$d] >= 0 THEN '1' ELSE '0' END")
          .mkString(" || ")
        s"""WITH b AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS v, ($duckBucket) AS bucket
           |  FROM embeddings),
           |probes AS (
           |  SELECT vec_id AS probe_id, v AS pv, bucket AS pbucket
           |  FROM b WHERE vec_id < 10),
           |scored AS (
           |  SELECT probe_id, pbucket, b.vec_id AS cand_id, b.bucket,
           |         ${duckCos("pv", "b.v")} AS cos
           |  FROM probes JOIN b ON b.vec_id <> probe_id),
           |brute AS (
           |  SELECT probe_id, cand_id FROM (
           |    SELECT probe_id, cand_id,
           |           ROW_NUMBER() OVER (PARTITION BY probe_id
           |                              ORDER BY cos DESC, cand_id) AS rn
           |    FROM scored) WHERE rn <= 5),
           |lsh AS (
           |  SELECT probe_id, cand_id FROM (
           |    SELECT probe_id, cand_id,
           |           ROW_NUMBER() OVER (PARTITION BY probe_id
           |                              ORDER BY cos DESC, cand_id) AS rn
           |    FROM scored WHERE bucket = pbucket) WHERE rn <= 5),
           |bs AS (
           |  SELECT probe_id, CAST(COUNT(*) AS BIGINT) AS bucket_size
           |  FROM scored WHERE bucket = pbucket GROUP BY 1),
           |hits AS (
           |  SELECT b.probe_id,
           |         CAST(COUNT(l.cand_id) AS BIGINT) AS n_hits
           |  FROM brute b LEFT JOIN lsh l
           |    ON b.probe_id = l.probe_id AND b.cand_id = l.cand_id
           |  GROUP BY 1)
           |SELECT h.probe_id, COALESCE(bs.bucket_size, 0) AS bucket_size,
           |       h.n_hits,
           |       CAST(h.n_hits * 1000000 // 5 AS BIGINT) AS recall_ppm
           |FROM hits h LEFT JOIN bs ON h.probe_id = bs.probe_id
           |ORDER BY h.probe_id""".stripMargin
      },
      (s, dir) => {
        val b = Tables.embeddings(s, dir).select(
          col("vec_id"), col("embedding"),
          Vectors.signBucket(col("embedding"), lshDims).as("bucket"))
        val probes = b.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
            col("bucket").as("pbucket"))
        val scored = b
          .select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
            col("bucket"))
          .crossJoin(broadcast(probes))
          .filter(col("cand_id") =!= col("probe_id"))
          .select(col("probe_id"), col("pbucket"), col("cand_id"), col("bucket"),
            Vectors.cosine(col("pv"), col("cv")).as("cos"))
          .cutLineage() // one scoring pass serves both rankings
        val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
        val brute = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5).select("probe_id", "cand_id")
        val lsh = scored.filter(col("bucket") === col("pbucket"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("probe_id").as("lp"), col("cand_id").as("lc"))
        val bs = scored.filter(col("bucket") === col("pbucket"))
          .groupBy("probe_id").agg(count(lit(1)).as("bucket_size"))
        brute
          .join(lsh, col("probe_id") === col("lp") && col("cand_id") === col("lc"),
            "left")
          .groupBy("probe_id")
          .agg(count(col("lc")).as("n_hits"))
          .join(bs, Seq("probe_id"), "left")
          .select(col("probe_id"),
            coalesce(col("bucket_size"), lit(0L)).as("bucket_size"),
            col("n_hits"),
            expr("n_hits * 1000000 div 5").as("recall_ppm"))
          .orderBy("probe_id")
      }),

    Q(
      "dd_embed_neardup",
      """Embedding near-dup: nearest same-label neighbor per vector
        |(label is the blocking key bounding the pairwise term, as `source`
        |does for Jaccard dedup). Output: each vector's nearest neighbor and
        |whether it crosses the 0.9 near-dup threshold.""".stripMargin,
      Some(
        s"""WITH b AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
           |pairs AS (
           |  SELECT a.vec_id AS vec_id, a.label AS label, b.vec_id AS nn_id,
           |         ${duckCos("a.v", "b.v")} AS cos
           |  FROM b a JOIN b b ON a.label = b.label AND a.vec_id <> b.vec_id)
           |SELECT vec_id, label, nn_id, cos, (cos >= 0.9) AS near_dup FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
           |                               ORDER BY cos DESC, nn_id) AS rn
           |  FROM pairs)
           |WHERE rn = 1
           |ORDER BY vec_id""".stripMargin),
      (s, dir) => {
        val b = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"), col("embedding"))
        val a2 = b.select(col("label"), col("vec_id").as("nn_id"), col("embedding").as("nv"))
        val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nn_id"))
        b.join(a2, Seq("label"))
          .filter(col("vec_id") =!= col("nn_id"))
          .withColumn("cos", Vectors.cosine(col("embedding"), col("nv")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("label"), col("nn_id"), col("cos"),
            (col("cos") >= 0.9).as("near_dup"))
          .orderBy("vec_id")
      }),

    Q(
      "dd_threshold_sweep",
      """Near-dup THRESHOLD CALIBRATION curve — the knob-tuning artifact
        |a semantic-dedup rollout needs before picking its cosine cutoff
        |(too low: false merges; too high: missed dups): the same
        |label-blocked pairwise frame as dd_embed_neardup is scored
        |ONCE, cosines bucket to 2 dp (integer centi-units), and a
        |cumulative window over the bounded bucket frame (<= 201 rows)
        |yields, for every candidate threshold, how many candidate pairs
        |a merge at that threshold would touch.
        |One pairwise pass serves every threshold — the sweep costs no
        |more than a single-threshold run; everything after the
        |blocked scoring is bucket-frame-sized.""".stripMargin,
      Some(
        s"""WITH b AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
           |pairs AS (
           |  SELECT a.vec_id AS ida, b.vec_id AS idb,
           |         CAST(floor(${duckCos("a.v", "b.v")} * 100) AS BIGINT) AS centi
           |  FROM b a JOIN b b ON a.label = b.label AND a.vec_id < b.vec_id),
           |bk AS (
           |  SELECT centi, CAST(COUNT(*) AS BIGINT) AS n_pairs
           |  FROM pairs GROUP BY 1),
           |c AS (
           |  SELECT centi, n_pairs,
           |         CAST(SUM(n_pairs) OVER (ORDER BY centi DESC
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |           AS BIGINT) AS pairs_at_or_above
           |  FROM bk)
           |SELECT centi AS threshold_centi, n_pairs, pairs_at_or_above
           |FROM c
           |ORDER BY threshold_centi DESC""".stripMargin),
      (s, dir) => {
        val b = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"), col("embedding"))
        val a2 = b.select(col("label"), col("vec_id").as("idb"),
          col("embedding").as("nv"))
        val bk = b.select(col("label"), col("vec_id").as("ida"), col("embedding"))
          .join(a2, Seq("label"))
          .filter(col("ida") < col("idb"))
          .select(floor(Vectors.cosine(col("embedding"), col("nv")) * 100)
            .cast("long").as("centi"))
          .groupBy("centi").agg(count(lit(1)).as("n_pairs"))
        val cw = Window.orderBy(col("centi").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bk.withColumn("pairs_at_or_above", sum(col("n_pairs")).over(cw))
          .select(col("centi").as("threshold_centi"), col("n_pairs"),
            col("pairs_at_or_above"))
          .orderBy(col("threshold_centi").desc)
      }),

    Q(
      "emb_int8_quantize",
      """Symmetric int8 embedding quantization — the storage/serving
        |compression step an ANN index applies before sharding: per
        |vector, scale = max |coordinate|, q_i = floor(v_i * 127 / scale).
        |Row-local (zero shuffle at any corpus size); outputs are integer
        |summaries of the quantized vector (sum / min / max) plus the
        |scale in floor micro-units, so the hash compare proves the
        |quantizer bit-for-bit while the final schema stays scalar-only.
        |The float ops are the same IEEE doubles on both engines and
        |floor has no tie, so no rounding divergence exists by
        |construction.""".stripMargin,
      Some(
        """WITH b AS (
          |  SELECT vec_id, embedding::DOUBLE[] AS v,
          |         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS s
          |  FROM embeddings),
          |q AS (
          |  SELECT vec_id, s, len(v) AS n_dims,
          |         list_transform(v, x -> CAST(floor(x * 127 / s) AS BIGINT)) AS qv
          |  FROM b WHERE s > 0)
          |SELECT vec_id, CAST(n_dims AS BIGINT) AS n_dims,
          |       CAST(list_sum(qv) AS BIGINT) AS q_sum,
          |       list_min(qv) AS q_min,
          |       list_max(qv) AS q_max,
          |       CAST(floor(s * 1000000) AS BIGINT) AS scale_ppm
          |FROM q
          |ORDER BY vec_id""".stripMargin),
      (s, dir) => {
        val b = Tables.embeddings(s, dir).select(
          col("vec_id"),
          Vectors.toDouble(col("embedding")).as("v"))
          .withColumn("s", array_max(transform(col("v"), x => abs(x))))
          .filter(col("s") > 0)
        b.withColumn("qv",
            transform(col("v"), x => floor(x * lit(127) / col("s"))))
          .select(
            col("vec_id"),
            size(col("v")).cast("long").as("n_dims"),
            aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
            array_min(col("qv")).as("q_min"),
            array_max(col("qv")).as("q_max"),
            floor(col("s") * 1000000).cast("long").as("scale_ppm"))
          .orderBy("vec_id")
      }),

    Q(
      "emb_hamming_topk",
      """Binary (sign-bit) embedding search — the most aggressive ANN
        |compression tier (1 bit/dim, 64× below float32; the Hamming
        |stage ITQ/LSH-style systems use to pre-rank before exact
        |re-scoring): each vector sign-quantizes to two packed 32-bit
        |blocks at the scan (63-bit-block rule — the sign bit stays
        |clear in BOTH engines), the 10 probe codes broadcast, and
        |distance is two XOR+popcounts on longs — no float math in the
        |hot loop at all, the property that makes a billion-candidate
        |Hamming sweep memory-bandwidth-bound rather than FLOP-bound.
        |Top-5 per probe, tie-broken by candidate id; the candidate side
        |never shuffles (probe broadcast + per-probe rank window over
        |scored pairs, the ann_bruteforce shape on 16 bytes/vector
        |instead of 512).""".stripMargin,
      Some(
        """WITH codes AS (
          |  SELECT vec_id,
          |         CAST(list_sum([CASE WHEN embedding[i + 1] >= 0 THEN 1::BIGINT << i
          |                             ELSE 0 END for i in range(32)]) AS BIGINT) AS c0,
          |         CAST(list_sum([CASE WHEN embedding[i + 33] >= 0 THEN 1::BIGINT << i
          |                             ELSE 0 END for i in range(32)]) AS BIGINT) AS c1
          |  FROM embeddings),
          |probes AS (
          |  SELECT vec_id AS probe_id, c0 AS p0, c1 AS p1 FROM codes
          |  WHERE vec_id < 10),
          |scored AS (
          |  SELECT probe_id, vec_id AS cand_id,
          |         CAST(bit_count(xor(p0, c0)) + bit_count(xor(p1, c1))
          |              AS INTEGER) AS hamming_d
          |  FROM probes, codes WHERE vec_id <> probe_id)
          |SELECT probe_id, cand_id, hamming_d, rn FROM (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
          |                               ORDER BY hamming_d, cand_id) AS rn
          |  FROM scored)
          |WHERE rn <= 5
          |ORDER BY probe_id, rn""".stripMargin),
      (s, dir) => {
        // pack bits [lo, lo+32) of the sign pattern into one long; each
        // pack is a single self-contained fold referenced once per
        // projection (the CollapseProject HOF rule)
        def pack(lo: Int) = expr(
          s"""aggregate(sequence(0, 31), 0L,
             |  (acc, i) -> acc + IF(element_at(embedding, i + ${lo + 1}) >= 0D,
             |                       shiftleft(1L, i), 0L))""".stripMargin
            .replace("\n", " "))
        val codes = Tables.embeddings(s, dir)
          .select(col("vec_id"), pack(0).as("c0"), pack(32).as("c1"))
        val probes = codes.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"),
            col("c0").as("p0"), col("c1").as("p1"))
        val w = Window.partitionBy("probe_id")
          .orderBy(col("hamming_d"), col("cand_id"))
        codes.select(col("vec_id").as("cand_id"), col("c0"), col("c1"))
          .crossJoin(broadcast(probes))
          .filter(col("cand_id") =!= col("probe_id"))
          .withColumn("hamming_d",
            (bit_count(expr("p0 ^ c0")) + bit_count(expr("p1 ^ c1"))).cast("int"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("probe_id", "cand_id", "hamming_d", "rn")
          .orderBy("probe_id", "rn")
      }),

    Q(
      "emb_avg_pool",
      """Chunk→document embedding mean-pooling — how a pipeline that embeds
        |fixed-size text chunks produces one vector per document (4
        |consecutive chunk vectors pool into each doc here). Same
        |order-independent arithmetic as the k-means recenter: coordinates
        |sum in exact DECIMAL(27,9) on the (doc, pos) key (map-side partial
        |agg collapses the shuffle to docs×dims rows — output-sized, the
        |100 TB-correct shape), mean divides in double and rounds to 6 dp.
        |The catalog output is LONG FORM — one scalar row per (doc, pos)
        |coordinate, with the doc-level chunk count and pooled L2 norm
        |repeated per row via a doc-partitioned window (output-sized work)
        |— because the oracle harness compares scalar columns; the
        |equivalent array-valued vector is covered by AvgPoolSpec. The norm
        |sums m² in exact DECIMAL so it is reduction-order independent
        |across engines. The oracle recomputes the whole pooling
        |element-wise — a hash match proves the vectors, not just their
        |counts.""".stripMargin,
      Some(
        """WITH b AS (SELECT vec_id, vec_id // 4 AS doc_id, embedding::DOUBLE[] AS v
          |           FROM embeddings),
          |m AS (
          |  SELECT doc_id, idx AS pos,
          |         round(CAST(SUM(CAST(v[idx] AS DECIMAL(27,9))) AS DOUBLE)
          |               / COUNT(*), 6) AS m,
          |         COUNT(*) AS cnt
          |  FROM b, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS idx)
          |  GROUP BY doc_id, idx)
          |SELECT doc_id, CAST(pos AS INTEGER) AS pos, m,
          |       MAX(cnt) OVER (PARTITION BY doc_id) AS n_chunks,
          |       round(sqrt(CAST(SUM(CAST(m AS DECIMAL(16,6))
          |                           * CAST(m AS DECIMAL(16,6)))
          |                         OVER (PARTITION BY doc_id) AS DOUBLE)), 6) AS norm
          |FROM m
          |ORDER BY doc_id, pos""".stripMargin),
      (s, dir) => {
        val b = Tables.embeddings(s, dir).select(
          expr("vec_id div 4").as("doc_id"),
          Vectors.toDouble(col("embedding")).as("v"))
        val dw = Window.partitionBy("doc_id")
        b.select(col("doc_id"), posexplode(col("v")))
          .groupBy("doc_id", "pos")
          .agg(
            round(sum(col("col").cast("decimal(27,9)")).cast("double")
              / count(lit(1)), 6).as("m"),
            count(lit(1)).as("cnt"))
          .withColumn("md", col("m").cast("decimal(16,6)"))
          .withColumn("n_chunks", max(col("cnt")).over(dw))
          .withColumn("norm",
            round(sqrt(sum(col("md") * col("md")).over(dw).cast("double")), 6))
          .select(col("doc_id"), (col("pos") + 1).cast("int").as("pos"),
            col("m"), col("n_chunks"), col("norm"))
          .orderBy("doc_id", "pos")
      }),

    Q(
      "emb_random_proj",
      """Random projection 64 -> 16 dims (Achlioptas/JL sign matrix) — the
        |dimensionality-reduction pass that makes SemDeDup-style clustering
        |and ANN affordable at corpus scale: out[i] = (sum_j s(i,j) *
        |v[j]) / 4, with signs +-1 derived from md5('p<i>_<j>') parity (a
        |DETERMINISTIC shared matrix — both engines derive the identical
        |signs, no RNG state anywhere) and 1/sqrt(16) = 1/4 an exact
        |binary scale. The fold runs j ascending in doubles on both
        |engines (Spark aggregate() from 0.0, DuckDB list_reduce — IEEE
        |addition is order-sensitive, identical order makes it exact).
        |Scale shape: the 16-row sign matrix is built once and broadcast;
        |projection is row-local at the scan — zero shuffle beyond the
        |output sort. Output long-form (vec_id, dim, val): scalar-only
        |schema per the catalog rule.""".stripMargin,
      Some(
        """WITH s AS (
          |  SELECT i, list(CASE WHEN strpos('01234567',
          |      substr(md5('p' || CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1)) > 0
          |    THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END ORDER BY j) AS sv
          |  FROM range(0, 16) t(i) CROSS JOIN range(1, 65) u(j)
          |  GROUP BY i),
          |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
          |SELECT e.vec_id, s.i AS dim,
          |       list_reduce(list_transform(range(1, 65),
          |         j -> s.sv[CAST(j AS INTEGER)] * e.v[CAST(j AS INTEGER)]),
          |         (a, b) -> a + b) / 4 AS val
          |FROM e CROSS JOIN s
          |ORDER BY vec_id, dim""".stripMargin),
      (s, dir) => {
        val signs = s.range(0, 16).select(col("id").as("dim"))
          .withColumn("sv", expr(
            """transform(sequence(1, 64), j ->
              |  CASE WHEN instr('01234567',
              |      substring(md5(concat('p', cast(dim as string), '_',
              |                           cast(j as string))), 1, 1)) > 0
              |  THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)""".stripMargin))
        Tables.embeddings(s, dir)
          .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
          .crossJoin(broadcast(signs))
          .select(col("vec_id"), col("dim"),
            expr("""aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE),
                   |  (acc, j) -> acc + element_at(sv, j) * element_at(v, j))
                   |/ 4""".stripMargin).as("val"))
          .orderBy("vec_id", "dim")
      }),

    Q(
      "emb_pq_encode",
      """Product quantization encode (PQ, the FAISS IVF-PQ building
        |block): 64-dim vectors split into 4 subspaces of 16 dims; each
        |subspace has an 8-centroid codebook (the first 8 vectors'
        |subvectors — the deterministic seed rule shared with emb_kmeans/
        |ann_ivf_cells; codebook TRAINING is already oracle-proven by
        |emb_kmeans, this query proves the ENCODE), and every vector
        |compresses to 4 one-byte codes = 64 floats -> 4 bytes. Output per
        |(vector, subspace): the argmin code (strict < fold keeps the
        |smaller index on ties — deterministic both engines) and the
        |round-6 squared quantization error. All distance folds run
        |j-ascending in doubles, so argmin comparisons see identical
        |values on both engines. Scale shape: the 32-row codebook
        |collapses to ONE broadcast row; encoding is row-local at the
        |scan (nested higher-order folds, distances computed once into a
        |4x8 matrix then argmin-scanned) — zero shuffle beyond the output
        |sort, the property that lets the encode pass run over billions
        |of vectors as a pure map.""".stripMargin,
      Some(
        s"""WITH $pqOracleCtes
           |SELECT vec_id, CAST(u.m AS INTEGER) AS m,
           |       CAST(cs[CAST(u.m+1 AS INTEGER)] AS INTEGER) AS code,
           |       round(ds[CAST(u.m+1 AS INTEGER)][CAST(cs[CAST(u.m+1 AS INTEGER)]+1 AS INTEGER)], 6)
           |         AS err6
           |FROM codes, LATERAL (SELECT unnest(range(0, 4)) AS m) u
           |ORDER BY vec_id, m""".stripMargin),
      (s, dir) =>
        pqBase(s, dir)
          .select(col("vec_id"), posexplode(expr(pqCodeExpr)))
          .select(col("vec_id"), col("pos").cast("int").as("m"),
            col("col.bk").cast("int").as("code"),
            round(col("col.bd"), 6).as("err6"))
          .orderBy("vec_id", "m")),

    Q(
      "ann_pq_adc",
      """PQ asymmetric-distance search (ADC — the query half of an IVF-PQ
        |index): each of 5 probes keeps its FULL-precision 4x8 subspace
        |distance table (probe-to-centroid, computed once per probe);
        |every candidate's approximate distance is then 4 TABLE LOOKUPS
        |(one per subspace code) summed m-ascending — the 16x compute
        |reduction (4 lookups vs 64 multiplies) that makes
        |billion-vector search affordable, and why PQ indexes scan
        |codes, not vectors. Probes broadcast WITH their tables; the
        |candidate scan stays shuffle-free; the per-probe top-5 rides
        |the bounded-heap aggregate (score = -distance, ties to the
        |smaller candidate id — matching the oracle's window order).
        |Output: probe, rank, candidate, round-6 ADC distance.""".stripMargin,
      Some(
        s"""WITH $pqOracleCtes,
           |probes AS (
           |  SELECT vec_id AS probe_id, ds AS dt FROM codes WHERE vec_id < 5),
           |scored AS (
           |  SELECT p.probe_id, c.vec_id AS cand_id,
           |         list_reduce(list_transform(range(0, 4), m ->
           |           p.dt[CAST(m+1 AS INTEGER)][CAST(c.cs[CAST(m+1 AS INTEGER)]+1 AS INTEGER)]),
           |           (a, b) -> a + b) AS ad
           |  FROM codes c CROSS JOIN probes p
           |  WHERE c.vec_id <> p.probe_id)
           |SELECT probe_id, rank, cand_id, round(ad, 6) AS ad6 FROM (
           |  SELECT probe_id, cand_id, ad,
           |         CAST(row_number() OVER (PARTITION BY probe_id
           |           ORDER BY ad, cand_id) AS BIGINT) AS rank
           |  FROM scored) WHERE rank <= 5
           |ORDER BY probe_id, rank""".stripMargin),
      (s, dir) => {
        val base = pqBase(s, dir)
        // probes materialize their full distance tables at broadcast
        // build; candidates carry code arrays only — each expression
        // referenced once (see pqDistExpr's duplication warning)
        val probes = base.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), expr(pqDistExpr).as("dt"))
        base.select(col("vec_id").as("cand_id"),
            expr(s"transform($pqCodeExpr, c -> c.bk)").as("cs"))
          .crossJoin(broadcast(probes))
          .filter(col("cand_id") =!= col("probe_id"))
          .select(col("probe_id"), col("cand_id"),
            expr("""aggregate(sequence(0, 3), CAST(0.0 AS DOUBLE), (a, m) ->
                   |  a + element_at(element_at(dt, m+1),
                   |                 element_at(cs, m+1) + 1))""".stripMargin).as("ad"))
          .groupBy("probe_id")
          .agg(Vectors.topKByScore(-col("ad"), col("cand_id"), 5).as("top"))
          .select(col("probe_id"), posexplode(col("top")))
          .select(col("probe_id"), (col("pos") + 1).cast("long").as("rank"),
            col("col.id").as("cand_id"),
            round(-col("col.score"), 6).as("ad6"))
          .orderBy("probe_id", "rank")
      }))
}
