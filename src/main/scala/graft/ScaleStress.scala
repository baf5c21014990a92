package graft

import graft.ops.ConnectedComponents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness for the iterative / quadratic-prone operators —
  * the shapes sf0.1's benign data never exercises: a heavy-tailed
  * duplicate group (one key owning 10⁴+ members), a deep chain (the
  * worst case for label propagation), a skewed aggregation key, and an
  * LSH hot band. Run via `tools/run.sh graft.ScaleStress [scale]`; the
  * assertions live in ScaleStressSpec with pinned round/time bounds.
  *
  * What it proves, per claim in the operator docs:
  *  - star edges keep heavy-tail CC LINEAR: the 10× fixture takes ~10×
  *    the work (not 100× — the all-pairs form this repo replaced);
  *  - pointer halving collapses a depth-d chain in <= ceil(log2 d) + 2
  *    rounds (label propagation) — never O(d);
  *  - large-star/small-star alternation converges within its O(log² n)
  *    bound on the same chain;
  *  - salting neutralizes a 90%-hot aggregation key with unchanged
  *    results;
  *  - the hot-band cap keeps LSH candidate generation collision-sized
  *    when one band key goes viral.
  */
object ScaleStress {

  /** One k-member duplicate group (all sharing key "hot") plus `singles`
    * singleton docs — the heavy-tailed group-size distribution dedup
    * data has, reduced to its worst row. Ids: 0..k-1 hot, then singles. */
  def heavyTailMembers(spark: SparkSession, k: Int, singles: Int): DataFrame = {
    spark.range(0, k + singles).select(
      col("id").as("doc_id"),
      when(col("id") < k, lit("hot"))
        .otherwise(concat(lit("k"), col("id"))).as("norm_key"))
  }

  /** A depth-d chain: edges (base+i) -- (base+i+1), symmetric. Diameter d
    * — the adversarial shape for any propagation scheme. */
  def chainEdges(spark: SparkSession, depth: Int, base: Long): DataFrame = {
    val fwd = spark.range(0, depth).select(
      (col("id") + base).as("src"), (col("id") + base + 1).as("dst"))
    fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  def chainNodes(spark: SparkSession, depth: Int, base: Long): DataFrame =
    spark.range(base, base + depth + 1).select(col("id").as("doc_id"))

  case class CcRun(variant: String, nodes: Long, rounds: Int,
                   seconds: Double, correct: Boolean)

  /** The verdict-specified fixture: one k-member duplicate group + one
    * depth-d chain, through BOTH CC variants. Correctness is closed-form:
    * hot members label 0, chain members label `base`, singletons
    * themselves. */
  def ccStress(spark: SparkSession, k: Int, singles: Int, depth: Int): Seq[CcRun] = {
    val base = (k + singles).toLong
    val members = heavyTailMembers(spark, k, singles)
    val nodes = members.select("doc_id")
      .unionAll(chainNodes(spark, depth, base))
      .persist()
    val edges = ConnectedComponents.starEdges(members, "doc_id", "norm_key")
      .unionAll(chainEdges(spark, depth, base))
      .persist()
    val nNodes = nodes.count(); edges.count() // materialize outside the timers

    def correct(labels: DataFrame): Boolean =
      labels.agg(count_if(
        (col("doc_id") < k && col("component") =!= 0L) ||
          (col("doc_id") >= k && col("doc_id") < base && col("component") =!= col("doc_id")) ||
          (col("doc_id") >= base && col("component") =!= base)
      )).first().getLong(0) == 0L

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val ((lpLabels, lpRounds), lpSec) =
      time(ConnectedComponents.run(nodes, edges, "doc_id", maxRounds = 40))
    val lp = CcRun("label_propagation", nNodes, lpRounds, lpSec, correct(lpLabels))
    val ((altLabels, altRounds), altSec) =
      time(ConnectedComponents.alternatingComponents(nodes, edges, "doc_id", maxRounds = 60))
    val alt = CcRun("alternating_star", nNodes, altRounds, altSec, correct(altLabels))
    nodes.unpersist(); edges.unpersist()
    Seq(lp, alt)
  }

  /** Salted aggregation under one 90%-hot key: the salted two-stage form
    * must equal the direct agg exactly and survive the skew. Returns
    * (rows, seconds, resultsEqual). */
  def saltedAggStress(spark: SparkSession, rows: Long, saltBuckets: Int): (Long, Double, Boolean) = {
    // 90% of rows land on key "hot"; values are id-derived so sums are
    // deterministic and overflow-free
    val df = spark.range(0, rows).select(
      when(col("id") % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 97)).as("key"),
      (col("id") % 1000).cast("long").as("v"))
    val t0 = System.nanoTime()
    val salted = df
      .withColumn("salt", pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
      .groupBy("key", "salt").agg(sum("v").as("ps"), count(lit(1)).as("pn"))
      .groupBy("key").agg(sum("ps").as("sum_v"), sum("pn").as("n"))
    val saltedRows = salted.collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    val direct = df.groupBy("key").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    (rows, sec, saltedRows == direct)
  }

  /** LSH hot band: `m` documents sharing one band key. Uncapped pairing
    * is m(m-1)/2; the cap must keep the candidate set collision-sized.
    * Returns (uncappedPairsFor(sample), cappedPairs) — the spec pins the
    * capped count to the sub-cap groups only. */
  def hotBandStress(spark: SparkSession, m: Int, cap: Int): (Long, Long) = {
    import graft.ops.NearDup
    // m near-identical docs (same 8-token core => same signature/bands)
    // + a handful of genuinely-similar small groups under the cap
    val hot = spark.range(0, m).select(
      col("id").as("doc_id"),
      lit("alpha beta gamma delta epsilon zeta eta theta").as("text"))
    // 3 two-member groups with group-disjoint vocabularies: exactly one
    // confirmed pair per group (jaccard 1.0), nothing across groups.
    // (Integer DIV, not `/`: Spark's `/` on longs is double division and
    // would suffix every doc differently.)
    val g = expr("id DIV 2").cast("string")
    val smallGroups = spark.range(0, 6).select(
      (col("id") + m).as("doc_id"),
      concat_ws(" ", Seq("a", "b", "c", "d", "e", "f", "g", "h")
        .map(t => concat(lit(t), g)): _*).as("text"))
    val docs = hot.unionAll(smallGroups)
    // uncapped on a SAMPLE of the hot set (full m would be m²/2 pairs —
    // the point): pairs grow quadratically
    val sample = hot.limit(40).unionAll(smallGroups)
    val uncapped = NearDup.confirmedPairs(sample, threshold = 0.5).count()
    val capped = NearDup.confirmedPairs(docs, threshold = 0.5,
      maxBandGroup = Some(cap)).count()
    (uncapped, capped)
  }

  case class PipelineRun(docs: Long, reps: Long, confirmedPairs: Long,
                         seconds: Double, correct: Boolean)

  /** The round-5 composition finding made falsifiable: one k-member
    * EXACT-duplicate group (identical text ⇒ identical shingle sets,
    * signatures, and band keys — the shape that used to land k docs in
    * one LSH band and pay k(k-1)/2 candidate pairs) plus `singles`
    * vocabulary-disjoint singletons, through the FULL
    * [[graft.pipelines.DedupPipeline]]. Correctness is closed-form (hot
    * members keeper 0, singletons keep themselves); `reps` and
    * `confirmedPairs` expose the pairing work the pipeline actually
    * paid — linear means the k-group collapsed to ONE doc before LSH. */
  def pipelineStress(spark: SparkSession, k: Int, singles: Int): PipelineRun = {
    import graft.pipelines.DedupPipeline
    val hot = spark.range(0, k).select(col("id").as("doc_id"),
      lit("alpha beta gamma delta epsilon zeta eta theta").as("text"))
    val rest = spark.range(0, singles).select((col("id") + k).as("doc_id"),
      concat_ws(" ", Seq("a", "b", "c", "d", "e", "f", "g", "h")
        .map(t => concat(lit(t), col("id"))): _*).as("text"))
    val docs = hot.unionAll(rest).persist()
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val assign = DedupPipeline.assignments(docs)
    val bad = assign.agg(count_if(
      (col("doc_id") < k && col("keeper") =!= 0L) ||
        (col("doc_id") >= k && col("keeper") =!= col("doc_id")))).first().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    val reps = DedupPipeline.representatives(docs)
    val nReps = reps.count()
    val nPairs = graft.ops.NearDup.confirmedPairs(reps).count()
    docs.unpersist()
    PipelineRun(nDocs, nReps, nPairs, sec, bad == 0L)
  }

  case class SemRun(k: Int, n: Long, pairs: Long, dups: Long, seconds: Double)

  /** The "k is the scale knob" claim of dd_semdedup made measurable: the
    * same n synthetic embeddings clustered at two different k, then the
    * ACTUAL within-cluster pairwise max-cosine aggregate timed. The
    * pairwise work is Σ_c |c|·(|c|−1)/2 ≈ n²/(2k); growing k must shrink
    * both the pair count and the wall time roughly ∝ 1/k — that is what
    * lets SemDeDup hold per-cluster cost constant by scaling k with the
    * corpus. Vectors are deterministic id-hash points in [0,1)⁸ (no RNG:
    * retries and engines reproduce them bit-for-bit). */
  def semdedupStress(spark: SparkSession, n: Int, k: Int): SemRun = {
    import graft.ops.EmbeddingKMeans
    val emb = spark.range(0, n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), d =>
        (pmod(col("id") * (d * 31 + 7) + d * 13, lit(997)) / 997.0)
          .cast("float")).as("embedding"))
    val t0 = System.nanoTime()
    val a = EmbeddingKMeans.fit(emb, k, iters = 2).persist()
    val x = a.select(col("vec_id"), col("cluster"), col("v"))
    val y = a.select(col("vec_id").as("y_id"), col("cluster"), col("v").as("yv"))
    val dups = x.join(y, Seq("cluster")).filter(col("y_id") < col("vec_id"))
      .groupBy("vec_id")
      .agg(max(graft.functions.Vectors.cosine(col("v"), col("yv"))).as("m"))
      .filter(col("m") >= 0.9).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val pairs = a.groupBy("cluster").count()
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long")).first().getLong(0)
    a.unpersist()
    SemRun(k, n, pairs, dups, sec)
  }

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runs1 = ccStress(spark, k = 10000 * scale, singles = 2000, depth = 1000)
    val runs10 = ccStress(spark, k = 100000 * scale, singles = 20000, depth = 1000)
    runs1.zip(runs10).foreach { case (r1, r10) =>
      println(s"""{"op":"cc_${r1.variant}","nodes_1x":${r1.nodes},"rounds_1x":${r1.rounds},"sec_1x":${r1.seconds},"correct_1x":${r1.correct},"nodes_10x":${r10.nodes},"rounds_10x":${r10.rounds},"sec_10x":${r10.seconds},"correct_10x":${r10.correct},"time_ratio":${r10.seconds / math.max(r1.seconds, 1e-9)}}""")
    }
    val (rows, sec, ok) = saltedAggStress(spark, 2000000L * scale, 32)
    println(s"""{"op":"salted_agg","rows":$rows,"sec":$sec,"equal":$ok}""")
    val (uncapped, capped) = hotBandStress(spark, 3000 * scale, 100)
    println(s"""{"op":"lsh_hot_band","uncapped_sample_pairs":$uncapped,"capped_pairs":$capped}""")
    val pr = pipelineStress(spark, k = 10000 * scale, singles = 500)
    println(s"""{"op":"dedup_pipeline","docs":${pr.docs},"reps":${pr.reps},"confirmed_pairs":${pr.confirmedPairs},"sec":${pr.seconds},"correct":${pr.correct}}""")
    val s8 = semdedupStress(spark, n = 20000 * scale, k = 8)
    val s64 = semdedupStress(spark, n = 20000 * scale, k = 64)
    println(s"""{"op":"semdedup_k_knob","n":${s8.n},"pairs_k8":${s8.pairs},"sec_k8":${s8.seconds},"pairs_k64":${s64.pairs},"sec_k64":${s64.seconds},"pair_ratio":${s8.pairs.toDouble / math.max(s64.pairs, 1L)}}""")
    spark.stop()
  }
}
