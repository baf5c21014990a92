package graft.ops

import graft.{ScaleStress, SparkSpec}
import graft.ops.Lineage._

/** Pinned round/time bounds for the iterative and quadratic-prone
  * operators under adversarial shapes — one heavy-tailed duplicate group,
  * one deep chain, one 90%-hot agg key, one viral LSH band. These are the
  * shapes sf0.1 never produces; the bounds here are the 100×-scale claims
  * from the operator docs made falsifiable. The same harness runs bigger
  * via `tools/run.sh graft.ScaleStress [scale]`.
  */
class ScaleStressSpec extends SparkSpec {

  // one 10^4-member duplicate group + a 10^3-deep chain (the verdict's
  // fixture), both CC variants
  private lazy val runs = ScaleStress.ccStress(spark, k = 10000, singles = 2000, depth = 1000)
  private lazy val lp = runs.find(_.variant == "label_propagation").get
  private lazy val alt = runs.find(_.variant == "alternating_star").get

  test("heavy-tail group + deep chain: both CC variants produce the exact labeling") {
    assert(lp.correct, s"label propagation mislabeled: $lp")
    assert(alt.correct, s"alternation mislabeled: $alt")
    assert(lp.nodes === 10000 + 2000 + 1001)
  }

  test("label propagation collapses a depth-1000 chain in <= log2(d) + 2 rounds") {
    // pointer halving: O(log diameter), never O(diameter). log2(1000) ~ 10.
    val bound = (math.log(1000) / math.log(2)).ceil.toInt + 2
    assert(lp.rounds <= bound, s"${lp.rounds} rounds > bound $bound")
  }

  test("alternation converges within its O(log^2 n) bound on the same fixture") {
    // Kiveris et al. SoCC'14: O(log^2 n) rounds; empirically a depth-1000
    // chain alternates home in ~log2(n) rounds — pin 2*log2(n) as the
    // regression tripwire (n = 13001 nodes => bound 28)
    val bound = 2 * (math.log(13001.0) / math.log(2)).ceil.toInt
    assert(alt.rounds <= bound, s"${alt.rounds} rounds > bound $bound")
  }

  test("star edges keep heavy-tail CC linear: 10x the group is <~10x the time") {
    // The all-pairs clique form this repo replaced is quadratic: 10x the
    // group => 100x the edges. Star form: 10x edges, same rounds. Allow
    // a wide scheduling-noise margin; quadratic growth would still trip.
    val r10 = ScaleStress.ccStress(spark, k = 100000, singles = 2000, depth = 1000)
    val lp10 = r10.find(_.variant == "label_propagation").get
    assert(lp10.correct)
    assert(lp10.rounds <= lp.rounds + 2,
      s"10x group changed round count: ${lp.rounds} -> ${lp10.rounds}")
    val ratio = lp10.seconds / math.max(lp.seconds, 1e-9)
    assert(ratio < 25.0, f"10x data took $ratio%.1fx the time (quadratic?)")
  }

  test("salted aggregation neutralizes a 90%-hot key with identical results") {
    val (_, _, equal) = ScaleStress.saltedAggStress(spark, rows = 2000000L, saltBuckets = 32)
    assert(equal)
  }

  test("a 10^4-member exact-dup group passes the FULL pipeline with linear pairing work") {
    // the round-5 composition finding: identical texts mean identical
    // signatures, so the uncapped form paid k(k-1)/2 ~ 5*10^7 candidate
    // pairs here. The representative collapse must reduce the group to
    // ONE doc before LSH pairing — and still label every member.
    val r = graft.ScaleStress.pipelineStress(spark, k = 10000, singles = 500)
    assert(r.correct, s"pipeline mislabeled: $r")
    assert(r.docs === 10500)
    assert(r.reps === 501, s"10^4-member group did not collapse: ${r.reps} reps")
    assert(r.confirmedPairs === 0,
      s"vocabulary-disjoint reps produced ${r.confirmedPairs} pairs")
  }

  test("semdedup's k knob: growing k shrinks within-cluster pairwise work ~ 1/k") {
    // the dd_semdedup docs claim per-cluster cost stays constant because k
    // scales with the corpus (SemDeDup's own recipe). Measure it: same
    // 8000 deterministic vectors, k=8 vs k=64 — the pairwise pair count
    // must drop by ~k-ratio (8x), allowing slack for uneven clusters.
    val s8 = ScaleStress.semdedupStress(spark, n = 8000, k = 8)
    val s64 = ScaleStress.semdedupStress(spark, n = 8000, k = 64)
    assert(s8.pairs > 0 && s64.pairs > 0)
    val ratio = s8.pairs.toDouble / s64.pairs
    assert(ratio >= 3.0,
      s"k=8 -> k=64 only cut pairwise work ${ratio}x (pairs ${s8.pairs} -> ${s64.pairs})")
  }

  test("pagerank hot-hub star: 2x10^5 spokes match the closed form exactly") {
    // the adversarial pagerank shape: every spoke links the hub, so the
    // dst-inflow aggregation has one key carrying 2*10^5 contributions.
    // Partial (map-side) aggregation collapses them per task — the sum
    // is algebraic — so the hot key never concentrates rows on one
    // reducer. Correctness is pinned against a closed-form Long twin of
    // the integer rank algebra (truncating division throughout).
    import org.apache.spark.sql.functions._
    val k = 200000L
    val spokes = spark.range(1, k + 1)
    val edges = spokes.select(col("id").as("src"), lit(0L).as("dst"))
      .unionAll(spokes.select(lit(0L).as("src"), col("id").as("dst")))
    val ranks = graft.queries.GraphQueries.pagerank(edges, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val mass = 1000000000000L
    val n = k + 1
    val base = (15L * (mass / n)) / 100L
    var hub = mass / n
    var spoke = mass / n
    (1 to 3).foreach { _ =>
      val hubIn = k * spoke // spokes have outdeg 1
      val spokeIn = hub / k // hub outdeg = k
      hub = base + (85L * hubIn) / 100L
      spoke = base + (85L * spokeIn) / 100L
    }
    assert(ranks.size === n)
    assert(ranks(0L) === hub, "hub rank diverged from the closed form")
    assert(ranks(1L) === spoke && ranks(k) === spoke,
      "spoke rank diverged from the closed form")
  }

  test("triangle hub star + clique: forward orientation does zero hub wedge work") {
    // the adversarial triangle shape: a 2x10^5-spoke hub. Under id-ordered
    // wedging (hub id 0 = smallest) the hub would fan out C(2x10^5, 2) ~
    // 2x10^10 wedge pairs; under degree-ordered orientation every star
    // edge points spoke->hub (spoke degree 1 < hub degree), spokes have
    // out-degree 1, and the star contributes ZERO wedges. A 60-clique
    // (disjoint id space) rides along to prove counting stays exact:
    // every clique node sits in C(59, 2) = 1711 triangles.
    import org.apache.spark.sql.functions._
    val k = 200000L
    val star = spark.range(1, k + 1)
      .select(lit(0L).as("u"), col("id").as("v"))
    val cliqueBase = 10000000L
    val ids = spark.range(0, 60).select((col("id") + cliqueBase).as("n"))
    val clique = ids.as("a").join(ids.as("b"), col("a.n") < col("b.n"))
      .select(col("a.n").as("u"), col("b.n").as("v"))
    val t0 = System.nanoTime()
    val counts = graft.queries.GraphQueries
      .triangleCounts(star.unionAll(clique))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(counts.size === 60, "only clique nodes participate in triangles")
    assert(!counts.contains(0L), "the hub sits in no triangle")
    assert(counts.values.forall(_ == 1711L),
      "every clique node must sit in C(59,2) = 1711 triangles")
    // generous wall bound: failure mode is the 2x10^10-wedge blowup,
    // which would not finish in minutes
    assert(secs < 120, f"triangle stress took $secs%.1f s — wedge blowup?")
  }

  test("bfs hot-hub star: one frontier round reaches 2x10^5 spokes, rounds stay bounded") {
    // the adversarial BFS shape: the seed IS a 2x10^5-degree hub. The
    // frontier join fans the hub's whole adjacency in one round — the
    // intended cost (reachability requires touching those edges) — and
    // the visited anti-join keeps later rounds from ever re-expanding
    // them. Failure mode: frontier re-expansion (spokes bounce back to
    // the hub and out again), which would double work every round.
    import org.apache.spark.sql.functions._
    val k = 200000L
    val spokes = spark.range(1, k + 1)
    val edges = spokes.select(lit(0L).as("src"), col("id").as("dst"))
      .unionAll(spokes.select(col("id").as("src"), lit(0L).as("dst")))
    val t0 = System.nanoTime()
    val levels = graft.queries.GraphQueries
      .bfsLevels(edges, spark.range(0, 1).select(col("id")), maxLvl = 3)
      .groupBy("lvl").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(levels === Map(0 -> 1L, 1 -> k),
      s"star BFS levels wrong: $levels — re-expansion or lost frontier")
    assert(secs < 60, f"BFS star stress took $secs%.1f s")
  }

  test("k-core peel on the star: spokes peel in round 1, the hub follows isolated in round 2") {
    // degree-peeling's adversarial shape: the hub survives round 1 with
    // degree 2x10^5 but becomes ISOLATED (absent from the degree table)
    // once its spokes peel — the isolated-node branch must catch it in
    // round 2, not leave it dangling as a phantom 3-core member. The
    // same iterated filter-by-aggregate the catalog row runs, driven
    // through the oracle-checked query shape at stress scale.
    import org.apache.spark.sql.functions._
    val k = 200000L
    val spokes = spark.range(1, k + 1)
    // undirected degree view, both directions like the catalog query
    var edges = spokes.select(lit(0L).as("u"), col("id").as("v"))
      .unionAll(spokes.select(col("id").as("u"), lit(0L).as("v")))
      .cutLineage()
    val allNodes = edges.select(col("u").as("node")).distinct().cutLineage()
    // append-only peeled set: per-round outs stay cut once, the running
    // union reads them directly — mirrors the catalog query's shape
    val peeledFrames =
      scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    def peeled: org.apache.spark.sql.DataFrame = peeledFrames.reduce(_ unionAll _)
    (1 to 3).foreach { r =>
      val deg = edges.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
      val present = deg.select("node")
      val low = deg.filter(col("d") < 3).select("node")
      val gone =
        if (peeledFrames.isEmpty) low
        else allNodes.join(peeled, Seq("node"), "left_anti")
          .join(present, Seq("node"), "left_anti")
          .unionAll(low)
      val out = gone.distinct().withColumn("peel_round", lit(r)).cutLineage()
      peeledFrames += out
      edges = edges
        .join(out.select(col("node").as("u")), Seq("u"), "left_anti")
        .join(out.select(col("node").as("v")), Seq("v"), "left_anti")
        .cutLineage()
    }
    val byRound = peeled.groupBy("peel_round").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(byRound.getOrElse(1, 0L) === k, s"spokes must all peel in round 1: $byRound")
    assert(byRound.getOrElse(2, 0L) === 1L,
      s"the isolated hub must peel in round 2: $byRound")
  }

  test("video decode leaves no ImageIO disk-cache files (bounded in-flight state)") {
    // Round-8 hardening after the round-7 scaled-bench failure block:
    // ImageIO's default useCache=true backs every codec stream with a
    // temp file in java.io.tmpdir ("imageio*.tmp"), so a scaled decode
    // pass used to churn thousands of temp files and hold the read-path
    // ones until GC. The decode stages now pin the in-memory cache and
    // close per-asset streams; peak per-task state is one open asset +
    // one decoded frame. Falsifiable observable: a full synthesize+decode
    // sweep must create ZERO imageio cache files.
    import org.apache.spark.sql.functions._
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    def cacheFiles(): Set[String] =
      Option(tmp.list()).getOrElse(Array.empty)
        .filter(n => n.startsWith("imageio") && n.endsWith(".tmp")).toSet
    val before = cacheFiles()
    val docs = spark.range(0, 400).select(col("id").as("doc_id"))
    val frames = Multimodal.decodeGifFrames(Multimodal.synthesizeGifs(docs))
    assert(frames.count() > 0)
    val pngs = Multimodal.decodeImageStats(Multimodal.synthesizePngs(docs))
    assert(pngs.count() === 400)
    val leaked = cacheFiles() -- before
    assert(leaked.isEmpty, s"codec pass left ImageIO cache files: $leaked")
  }

  test("LSH hot band: uncapped pairing is quadratic; the cap keeps it collision-sized") {
    val (uncappedSample, capped) = ScaleStress.hotBandStress(spark, m = 3000, cap = 100)
    // 40-doc sample of the hot band alone: 40*39/2 pairs + the 3 real
    // group pairs — quadratic growth made visible
    assert(uncappedSample === 40L * 39 / 2 + 3)
    // capped full run (3000-member hot band dropped): only the 3 genuine
    // under-cap pairs survive — no m^2 blowup
    assert(capped === 3)
  }

  test("symspell blocking: a 10^4-member duplicate name collapses to ONE distinct row before pairing") {
    // dd_symspell_neighbors claims its pair work is bounded by the NAME
    // domain, not the row count — the exact-dup pre-collapse. Feed a
    // supplier table where one name repeats 10^4 times next to 200
    // distinct names: the output must be 201 rows (one per distinct
    // name), the hot name must carry members=10^4, and its edit-1
    // neighbors must be found despite the collapse. The catalog query
    // runs UNCHANGED against a synthetic dir — same code path the
    // oracle hashes.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("symspell-stress").toFile
    try {
      val hot = Seq.tabulate(10000)(i => (1000000L + i, "Supplier#000000001"))
      val distinct = Seq.tabulate(200)(i => (2000000L + i, f"Supplier#${i + 2}%09d"))
      (hot ++ distinct).toDF("s_suppkey", "s_name")
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/supplier.parquet")
      val out = graft.queries.Catalog.byName("dd_symspell_neighbors")
        .build(spark, dir.getAbsolutePath).collect()
      assert(out.length === 201, s"expected 201 distinct names, got ${out.length}")
      val hotRow = out.find(_.getAs[String]("name") == "Supplier#000000001").get
      assert(hotRow.getAs[Long]("members") === 10000L)
      // edit-1 neighbors of ...001 among ...002..201: last-digit subs
      // 002..009 (8), tens-digit subs 011..091 (9), hundreds-digit subs
      // 101 and 201 (2) = 19 in-range single-substitution names
      assert(hotRow.getAs[Long]("n_near") === 19L,
        s"hot name neighbor count: ${hotRow.getAs[Long]("n_near")}")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir); ()
    }
  }
}
