package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Golden plan-shape checks: the scale-design decisions (broadcast the
  * dimension, pre-aggregate before the join, bounded shuffle count) are
  * asserted on the physical plan so a regression fails the suite instead
  * of only degrading a benchmark. Counts are upper bounds — AQE may
  * coalesce below them, never above. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    Catalog.byName(name).build(spark, sfSmoke).queryExecution.executedPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val self = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
    }.flatten
    self ++ nested
  }

  // Round-robin exchanges are excluded: the only round-robin in the
  // engine is Par.spread's deliberate scan-spread over the single-row-
  // group testdata (round 16, guide §2.5) — a no-op on real multi-split
  // tables — and counting it would make every shuffle pin assert the
  // testdata's file layout rather than the query's shape. Every KEYED
  // exchange still counts.
  private def shuffles(p: SparkPlan) = collectAll(p) {
    case e: ShuffleExchangeExec
      if !e.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => e
  }
  private def bcasts(p: SparkPlan) = collectAll(p) { case e: BroadcastHashJoinExec => e }

  test("dimension lookups broadcast (no shuffled join)") {
    Seq("j1_item_branch_join", "j3_ci_first_match", "j4_movement_enrich").foreach { q =>
      withClue(q) { assert(bcasts(plan(q)).nonEmpty, s"$q lost its broadcast join") }
    }
    // the probe cross join has no equi keys -> BroadcastNestedLoopJoin;
    // assert the broadcast exchange itself
    val annBcast = collectAll(plan("ann_bruteforce_topk")) {
      case e: BroadcastExchangeExec => e
    }
    assert(annBcast.nonEmpty, "ann_bruteforce_topk lost its probe broadcast")
  }

  test("flagship reconcile: two pre-agg shuffles + one join/sort stage, no more") {
    // 2 partial->final agg exchanges, the full-outer join's exchanges are
    // those same two, + 1 final ORDER BY range exchange = at most 3
    assert(shuffles(plan("flagship_reconcile")).length <= 3)
  }

  test("blocked jaccard/containment never shuffle the pair fan-out") {
    // broadcast pair join: shuffles only for the final ordered output
    Seq("dd_ngram_jaccard", "dd_containment").foreach { q =>
      withClue(q) { assert(shuffles(plan(q)).length <= 1, s"$q grew a shuffle") }
    }
  }

  test("scan-side operators have at most the output-sort shuffle") {
    Seq("t_token_quality", "t_fingerprints", "f5_f7_transaction_ids",
      "mm_media_stats", "f19_sanitize", "t_repetition_quality",
      "f20_cache_key", "s_chunk_overlap", "mm_frame_manifest",
      "t_pii_scrub", "mm_decode_stats", "mm_video_frames",
      "mm_resize_stats", "t_quality_score", "t_html_strip",
      "t_script_mix").foreach { q =>
      withClue(q) { assert(shuffles(plan(q)).length <= 1, s"$q grew a shuffle") }
    }
  }

  test("epoch shuffle: rank window partitions by shard (parallelism = nShards, no global sort)") {
    val p = plan("s_epoch_shuffle")
    // one shard shuffle for the window + the output sort, nothing more
    assert(shuffles(p).length <= 2, "epoch shuffle grew a shuffle")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "per-epoch rank window must stay partitioned by shard")
  }

  test("token-budget selection: histogram cutoff broadcast, corpus-sized window only for the straddling bucket") {
    val p = plan("s_token_budget")
    // the cutoff table is checkpoint-materialized once, so the plan shows
    // only the straddle window's exchange + the output sort; the decided
    // buckets join the broadcast cutoff table row-locally
    assert(shuffles(p).length <= 2)
    assert(bcasts(p).nonEmpty, "cutoff table no longer broadcast")
  }

  test("boilerplate removal broadcasts the line set (corpus never shuffles to be cleaned)") {
    val p = plan("t_boilerplate_lines")
    // line-freq agg + total-count + one-row boiler collect + output sort;
    // the cleaning itself is a broadcast nested-loop of a one-row array
    assert(shuffles(p).length <= 4)
    val bnl = collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.nonEmpty, "boiler set no longer broadcast")
  }

  test("contamination check broadcasts the benchmark side (corpus never shuffles for the join)") {
    assert(bcasts(plan("dd_contamination")).nonEmpty,
      "dd_contamination lost its benchmark broadcast")
  }

  test("grouping-set reports are ONE aggregate pass (expand, not a union of scans)") {
    Seq("a_rollup_totals", "a_grouping_sets").foreach { q =>
      withClue(q) {
        val p = plan(q)
        assert(p.toString.contains("Expand"), s"$q lost its Expand")
        // one partial->final agg exchange + the output sort, nothing more
        assert(shuffles(p).length <= 2, s"$q grew extra shuffles")
      }
    }
  }

  test("k-means assignment is row-local: no n×k window, vector side only shuffles for recenter partials") {
    val p = plan("emb_kmeans")
    // the crossJoin+row_number anti-pattern would show as a WindowExec over
    // n×k rows; the fold-argmin form has NO window anywhere
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "k-means assignment regressed to a windowed argmin")
    // 2 packed-centroid one-row aggs + recenter's (cluster,pos)->cluster
    // agg pair + the output sort = at most 5 exchanges, all key-sized
    assert(shuffles(p).length <= 5, "emb_kmeans grew a shuffle")
  }

  test("substring-span dedup: no self-join, window stays hash-partitioned, bounded shuffles") {
    val p = plan("dd_substring_spans")
    // the (hash,doc) pair agg + hash-frequency window + doc rollup + output
    // sort; the oracle's w JOIN d corpus rescan must NOT appear
    assert(shuffles(p).length <= 4, "dd_substring_spans grew a shuffle")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "span dedup regressed to the self-join form")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "doc-frequency window lost its hash partitioning")
  }

  test("semdedup: pairwise cosine stays inside the cluster join, no global window") {
    val p = plan("dd_semdedup")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "dd_semdedup grew a window")
  }

  test("ivf-kmeans search broadcasts the probe set") {
    assert(bcasts(plan("ann_ivf_kmeans")).nonEmpty,
      "ann_ivf_kmeans lost its probe broadcast")
  }

  test("top-k per time window rides the group-limit rewrite") {
    val p = plan("w_topk_per_window")
    assert(p.toString.contains("WindowGroupLimit"),
      "w_topk_per_window lost the rank-pushdown rewrite")
    // (hour,user) agg pair + hour rank exchange + output sort
    assert(shuffles(p).length <= 3, "w_topk_per_window grew a shuffle")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "rank window must stay partitioned by hour")
  }

  test("top-k latest plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("w5_topk_latest").toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("pagination plans as offset+limit top-k with no window at all") {
    val p = plan("w2_w4_pagination").toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"),
      "pagination must not plan any window (the old global row_number shape)")
  }

  test("url dedup is the exact-groups shape: one agg shuffle + output sort") {
    assert(shuffles(plan("dd_url_dedup")).length <= 2, "dd_url_dedup grew a shuffle")
  }

  test("phash image dedup shuffles fingerprints only: decode scan-side, pixels never cross the wire") {
    // decode+aHash run inside mapPartitions before any exchange; the
    // shuffles are the fingerprint groupBy, the distinct-class expand
    // (Spark's standard two-exchange distinct agg), and the final ORDER
    // BY — every one keyed and sized by the 8-byte fingerprint
    val p = plan("mm_phash_dedup")
    val ex = shuffles(p)
    assert(ex.length <= 3, "mm_phash_dedup grew a shuffle")
    ex.foreach { e =>
      val cols = e.output.map(_.name.toLowerCase)
      assert(!cols.exists(c => c.contains("blob") || c.contains("px")),
        s"an exchange carries pixel/blob data: $cols")
    }
  }

  test("corr matrix: ONE aggregate pass — a single data shuffle carries 10 bigints per group") {
    assert(shuffles(plan("a_corr_matrix")).length <= 2,
      "a_corr_matrix must stay a one-pass sufficient-statistics agg + sort")
  }

  test("time-weighted avg: LEAD window and agg share the (user,day) key — one data shuffle + sort") {
    val p = plan("w_time_weighted_avg")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "duration LEAD must stay partitioned by (user, day)")
    // the agg reuses the window's hash partitioning; only the window
    // exchange + the output sort remain
    assert(shuffles(p).length <= 2, "w_time_weighted_avg grew a shuffle")
  }

  test("private agg: one contribution-cap window + one release agg, both on bucket-able keys") {
    val p = plan("a_private_agg")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "contribution cap must stay partitioned by (user, type) — no global window")
    // cap window shuffle + distinct-user expand pair + output sort
    assert(shuffles(p).length <= 4, "a_private_agg grew a shuffle")
  }

  test("hll distinct: register sketch aggregates before shuffling, calibration join broadcasts") {
    val p = plan("a_hll_distinct")
    // register max agg + register-sum agg + the exact-distinct expand
    // pair + output sort; the (type,reg,rho) shuffle is the sketch —
    // types x 64 rows after map-side partial max, never the key set
    assert(shuffles(p).length <= 5, "a_hll_distinct grew a shuffle")
    assert(bcasts(p).nonEmpty, "5-row calibration join no longer broadcast")
  }

  test("seasonal deviation: the 120-row profile broadcasts onto the hourly frame") {
    val p = plan("w_seasonal_deviation")
    assert(bcasts(p).nonEmpty, "hour-of-day profile no longer broadcast")
    // hourly agg + profile agg + output sort
    assert(shuffles(p).length <= 3, "w_seasonal_deviation grew a shuffle")
  }

  test("autocorrelation: LEAD windows run over the collapsed hourly frame") {
    val p = plan("a_autocorrelation")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "lag pairing must stay (type, lag)-partitioned")
    // hourly agg + frame window + stats agg + output sort
    assert(shuffles(p).length <= 4, "a_autocorrelation grew a shuffle")
  }

  test("burst detection: baseline window runs over the collapsed hourly frame") {
    val p = plan("w_burst_detection")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "baseline window must stay type-partitioned")
    // hourly agg + frame window + output sort
    assert(shuffles(p).length <= 3, "w_burst_detection grew a shuffle")
  }

  test("equi-depth histogram: cumulative window runs over the checkpointed value frame") {
    val p = plan("a_equidepth_histogram")
    // value-frame agg + boundary join + output sort; the global window
    // over the (dollars, freq) frame sits behind the checkpoint
    assert(shuffles(p).length <= 4, "a_equidepth_histogram grew a shuffle")
  }

  test("cdc apply roundtrip: three struct-max snapshot aggs, user-keyed merges, single-row out") {
    val p = plan("k_cdc_apply_roundtrip")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "snapshots must stay struct-max aggregates, not windows")
  }

  test("late-arrival audit: runmax window and agg share the (type,day) key") {
    val p = plan("audit_late_arrivals")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "disorder window must stay (type, day)-partitioned")
    assert(shuffles(p).length <= 2, "audit_late_arrivals grew a shuffle")
  }

  test("node similarity: degrees broadcast onto the wedge frame") {
    assert(bcasts(plan("g_node_similarity")).nonEmpty,
      "degree tables no longer broadcast")
  }

  test("weighted median / gini: windows run over collapsed frames, never the corpus") {
    Seq("a_weighted_median", "a_gini_concentration").foreach { q =>
      withClue(q) {
        val p = plan(q)
        val windows = collectAll(p) {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        assert(windows.forall(_.partitionSpec.nonEmpty),
          s"$q grew a global window")
        // corpus agg -> frame window -> cutoff agg -> calibration join
        assert(shuffles(p).length <= 4, s"$q grew a shuffle")
      }
    }
  }

  test("mips reduction: probes and the norm scalar broadcast — the candidate scan never shuffles") {
    val p = plan("emb_mips")
    val bex = collectAll(p) { case e: BroadcastExchangeExec => e }
    assert(bex.size >= 2, "probes and M^2 must both broadcast")
  }

  test("streak detection: distinct day-frame fan-in, then one user partitioning end to end") {
    val p = plan("w_streak_detection")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "island numbering must stay user-partitioned")
    // events -> distinct (user,day) shuffle; island window + both aggs
    // reuse that partitioning; + the output sort
    assert(shuffles(p).length <= 3, "w_streak_detection grew a shuffle")
  }

  test("top paths: prefix window + path agg share the user key; ranking is a bounded top-k") {
    val p = plan("w_top_paths")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "prefix selection must stay user-partitioned")
    assert(p.toString.contains("TakeOrderedAndProject"),
      "LIMIT 20 must plan as top-k, not a global sort")
  }

  test("join-size estimate: per-side aggs feed checkpointed sketches; scalar assembly broadcasts") {
    val p = plan("a_join_size_est")
    assert(bcasts(p).nonEmpty || collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, "one-row assembly no longer broadcast")
  }

  test("multitouch attribution: range-bin equi join, purchase-keyed share windows, no cartesian") {
    val p = plan("j_multitouch_attribution")
    val bnl = collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bnl.isEmpty, "the view-purchase match must stay a (user,bin) equi join")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "credit windows must stay purchase-partitioned")
  }

  test("scd2 point-in-time lookup: union-scan on one user partitioning, no join operator at all") {
    val p = plan("j_scd2_lookup")
    val joins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty,
      "the temporal lookup must resolve by union-scan carry, not a join")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "every window must stay user-partitioned")
  }

  test("theta intersect: sketch built once, pair work is sample-sized, thetas broadcast") {
    val p = plan("a_theta_intersect")
    assert(bcasts(p).nonEmpty, "theta tables no longer broadcast")
    // (type,user) distinct + sketch agg feed the checkpointed sketch;
    // downstream: pair-count agg + the exact twin's distinct + join +
    // agg exchanges + output sort
    assert(shuffles(p).length <= 8, "a_theta_intersect grew a shuffle")
  }

  test("sliding hll: corpus scans once into daily sketches; window merging is sketch-table-sized") {
    val p = plan("w_hll_sliding_distinct")
    assert(bcasts(p).nonEmpty, "corpus-days calendar no longer broadcast")
    // daily-sketch agg + window re-merge agg + estimate agg + the exact
    // twin's distinct + count-distinct expand pair + output sort: the
    // raw corpus crosses a shuffle exactly twice (daily sketch, exact
    // distinct) — everything else moves register- or frame-sized data,
    // and the calendar is checkpoint-materialized once
    assert(shuffles(p).length <= 7, "w_hll_sliding_distinct grew a shuffle")
  }

  test("interval-overlap join: incident side broadcast, span fan-out never shuffles") {
    val p = plan("j_interval_overlap")
    assert(bcasts(p).nonEmpty, "incident windows no longer broadcast")
    // span agg + hourly agg + per-type total agg + output sort; the
    // bin-exploded spans join the broadcast incidents without moving
    assert(shuffles(p).length <= 4, "j_interval_overlap grew a shuffle")
  }

  test("perplexity buckets: cutoffs broadcast as one row, no doc-sized window") {
    val p = plan("t_perplexity_buckets")
    // the (c1, c2) cutoff row joins the scored corpus by broadcast nested
    // loop; the only global windows run over the VALUE histogram frame
    // (bounded by distinct micro-values), never over docs
    val bnl = collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.nonEmpty, "cutoff row no longer broadcast")
    // the checkpointed cutoff row keeps the final plan to ONE scoring
    // lineage: bigram agg pair + context agg + model join + doc agg + sort
    assert(shuffles(p).length <= 6, "t_perplexity_buckets grew a shuffle")
  }

  test("MAD outliers: medians broadcast back, events only stream") {
    val p = plan("a_outlier_mad")
    // two key-sized broadcast joins (median, MAD) back onto the stream
    assert(bcasts(p).length >= 2, "a_outlier_mad lost a stats broadcast")
    // median agg (appears under BOTH the MAD branch and the fence branch —
    // the deviation scan is recomputed per pass, which is the three-pass
    // algorithm's nature) + MAD agg + fence agg + output sort
    assert(shuffles(p).length <= 5, "a_outlier_mad grew a shuffle")
  }

  test("star schema: snowflake collapses into ONE broadcast, fact shuffles only for the rollup") {
    val p = plan("j_star_schema")
    assert(bcasts(p).nonEmpty, "j_star_schema lost its dimension broadcast")
    // dim-side composition may exchange dim-sized frames; the FACT side
    // must reach its partial aggregate without any exchange, so the total
    // is the rollup agg pair + output sort at most
    assert(shuffles(p).length <= 2, "j_star_schema fact side grew a shuffle")
  }

  test("Q9 join-order stress: fact streams through broadcast dims, one fact-fact exchange") {
    val p = plan("j_q9_profit_rollup")
    // the scoping part list AND the collapsed supplier->nation->region
    // snowflake must both build as broadcasts against the streaming fact
    assert(bcasts(p).length >= 2,
      "j_q9_profit_rollup lost a dimension broadcast — the fact no longer streams")
    // data-scaled exchanges: at most the lineitem ⋈ orders pair on
    // l_orderkey (the one genuine fact-fact join — the year lives on the
    // order) + the group-sized aggregate exchange + the output range sort.
    // AQE may replan the orders side to broadcast at smoke scale (fewer
    // exchanges) — the bound holds either way.
    assert(shuffles(p).length <= 4,
      s"j_q9_profit_rollup grew a shuffle: ${shuffles(p).length}")
    // exactly one join may be non-broadcast; a second one means a
    // dimension fell out of its broadcast
    val nonBcast = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if !j.isInstanceOf[BroadcastHashJoinExec] => j
    }
    assert(nonBcast.length <= 1,
      s"more than one shuffled join: ${nonBcast.map(_.nodeName)}")
  }

  test("fuzzy match: residue probes broadcast, master table never shuffles") {
    val p = plan("j_fuzzy_match")
    assert(bcasts(p).nonEmpty, "j_fuzzy_match lost its probe broadcast")
    // probe-key agg + output sort only
    assert(shuffles(p).length <= 2, "j_fuzzy_match grew a shuffle")
  }

  test("soft dedup: one content-key exchange serves both windows, no join") {
    val p = plan("dd_soft_weights")
    assert(shuffles(p).length <= 2, "dd_soft_weights grew a shuffle")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "dd_soft_weights regressed to a groupBy+join-back form")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "group-size window must stay partitioned by content key")
  }

  // dd_minhash_est (like dd_lsh_confirm, whose generator it shares) is
  // eagerly localCheckpoint'd to release its corpus-sized shingle cache,
  // so its executedPlan is an RDD scan — the broadcast-through-joins shape
  // is the NearDup pattern, asserted indirectly via dd_contamination and
  // documented in PLANS.md.

  test("oov rate: vocab broadcast as one row, corpus never shuffles for scoring") {
    val p = plan("t_oov_rate")
    // token-frequency agg + vocab rank/collapse + output sort; the per-doc
    // scoring joins the one-row vocab by broadcast nested loop
    assert(shuffles(p).length <= 4, "t_oov_rate grew a shuffle")
    val bnl = collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.nonEmpty, "vocab no longer broadcast")
  }

  test("stratified split: one stratum shuffle serves both windows, bounded total") {
    val p = plan("s_stratified_split")
    // source-key window exchange + (source,bucket) agg + output sort
    assert(shuffles(p).length <= 3, "s_stratified_split grew a shuffle")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "stratum windows must stay partitioned by source")
  }

  test("avg-pool: (doc,pos) agg exchange + doc-partitioned stats window, bounded") {
    val p = plan("emb_avg_pool")
    // (doc,pos) partial->final agg + doc-level window exchange for
    // n_chunks/norm + output sort; map-side combine keeps the first
    // shuffle output-sized and the window operates on docs×dims rows
    // (already output-sized), never the raw chunk rows
    assert(shuffles(p).length <= 3, "emb_avg_pool grew a shuffle")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "emb_avg_pool doc-stats window must stay partitioned by doc_id")
  }

  test("int8 quantization is scan-side: at most the output-sort shuffle") {
    assert(shuffles(plan("emb_int8_quantize")).length <= 1,
      "emb_int8_quantize grew a shuffle")
  }

  test("zorder clustering: scan-side curve position + one 16-key aggregate") {
    assert(shuffles(plan("k_zorder_cluster")).length <= 2,
      "k_zorder_cluster grew a shuffle")
  }

  test("referential audit: every dimension probes by broadcast, facts never shuffle") {
    val p = plan("audit_referential")
    assert(bcasts(p).length >= 5, "audit lost a dimension broadcast")
    // 5 single-row summaries + output sort: the only exchanges are the
    // global one-row aggregations and the final order
    assert(collectAll(p) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }.isEmpty, "audit regressed to a shuffled join")
  }

  test("pagerank: node-count broadcast each iteration, no window, no cartesian blowup") {
    val p = plan("g_pagerank")
    val bnl = collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.nonEmpty, "pagerank node-count row lost its broadcast")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "pagerank must not plan a window")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "pagerank planned a cartesian product")
  }

  test("funnel: user-keyed stages only, week rollup bounded, no window") {
    val p = plan("w_funnel_conversion")
    // (user,week) agg + user-keyed purchase join + (user,week) re-agg +
    // week rollup + output sort — all hash exchanges on user or week keys
    assert(shuffles(p).length <= 7, "w_funnel_conversion grew a shuffle")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "funnel planned a cartesian product")
  }

  test("kmv sketch: bounded-heap aggregate, no per-group window over the hash set") {
    val p = plan("a_kmv_distinct")
    // the k-smallest selection must ride the TopKByScore
    // TypedImperativeAggregate (ObjectHashAggregate), NOT a row_number
    // window — the window form would sort every distinct hash per group
    assert(collectAll(p) {
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
    }.nonEmpty, "kmv lost its bounded-heap aggregate")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "kmv must not plan a window")
  }

  test("HITS: per-halfstep edge join + key agg, one-row max broadcasts, no cartesian") {
    val p = plan("g_hits_scores")
    // the normalizers are one-row max frames riding BroadcastNestedLoopJoin
    // cross joins — never a CartesianProduct (which would mean a
    // non-broadcast normalizer fanning over the node set)
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "HITS normalizer planned a cartesian product")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, "HITS lost its one-row max broadcast")
    // visible plan (downstream of the iteration checkpoints): final
    // authority half-step joins the checkpointed edge list to the
    // checkpointed hub frame, aggregates per supplier, normalizes, and
    // unions with the hub output — all exchanges are node/edge-keyed
    assert(shuffles(p).length <= 8, s"g_hits_scores grew a shuffle: ${shuffles(p).length}")
  }

  test("kmv quantiles: heap-sampled side broadcasts, windows stay key-partitioned") {
    val p = plan("a_kmv_quantiles")
    // the sample is the bounded-heap aggregate (partial+final
    // ObjectHashAggregate around ONE type-keyed exchange) — shuffle
    // carries 64 x |types|, never the corpus
    assert(collectAll(p) {
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
    }.length >= 2, "kmv quantiles lost its bounded-heap aggregate pair")
    // the 5-row estimate frame must broadcast into the calibration join
    assert(bcasts(p).nonEmpty, "estimate side stopped broadcasting")
    // every window (sample ranking + collapsed-frame cumulative) is
    // type-partitioned; no global window anywhere
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "a window lost its type partitioning")
    // sample-side exchange + exact-side (typ,vm) agg + typ window
    // exchange + output sort
    assert(shuffles(p).length <= 5, "a_kmv_quantiles grew a shuffle")
  }

  test("bloom prefilter: mask and member set broadcast, fact shuffles only to aggregate") {
    val p = plan("j_bloom_prefilter")
    // one-row mask rides a BroadcastNestedLoopJoin, the exact member set
    // a BroadcastHashJoin — the lineitem scan itself never shuffles
    // before the 3-key final aggregate
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, "bloom mask lost its broadcast")
    assert(bcasts(p).nonEmpty, "exact member set lost its broadcast join")
    // supplier-side mask build aggs + final flag agg + output sort; all
    // but one exchange carry supplier-sized (tiny) data
    assert(shuffles(p).length <= 6, "j_bloom_prefilter grew a shuffle")
  }

  test("corpus pipeline: two key windows (curl, source) + output sort, nothing global") {
    val p = plan("corpus_pipeline_keepers")
    // URL-dedup keeper window (curl exchange) + per-source budget window
    // (source exchange) + output sort; stages 2-4 are scan-side
    // expressions riding those exchanges — a global window or extra join
    // here would mean a stage regressed
    assert(shuffles(p).length <= 3, "corpus_pipeline_keepers grew a shuffle")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "corpus pipeline windows must stay key-partitioned (curl / source)")
  }

  test("asof joins: one user-key shuffle serves the window, no pairwise blowup") {
    Seq("j_asof_attribution", "j_asof_tolerance").foreach { q =>
      withClue(q) {
        val p = plan(q)
        // the union-scan form: user-key exchange for the window + the
        // output sort; a join operator appearing here would mean the
        // composition regressed to a pairwise probe
        assert(shuffles(p).length <= 3, s"$q grew a shuffle")
        val windows = collectAll(p) {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
          s"$q carried-view window lost its user partitioning")
      }
    }
  }

  test("event-time lower bound reaches the parquet scan on the current encoding") {
    // eventsSince places the bound on the RAW scanned `ts` column (long
    // nanos or native timestamp, whichever this testdata generation
    // carries), so it must appear as a pushed GreaterThanOrEqual — the
    // row-group-skipping path that matters at 100 TB
    val p = plan("p5_p6_event_filter").toString
    assert(p.contains("GreaterThanOrEqual(ts,"),
      s"event-time bound no longer pushes to the events scan:\n$p")
  }

  test("keyset pagination pushes the continuation predicate into the scan") {
    val p = plan("w_keyset_page").toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("PushedFilters: [IsNotNull(p_name), GreaterThan(p_name,aquamarine)]")
      || p.contains("GreaterThan(p_name,aquamarine)"), p)
  }

  test("sampling/mixing/split are scan-side: at most one agg shuffle + output sort") {
    assert(shuffles(plan("s_hash_split")).length <= 2, "s_hash_split grew a shuffle")
    // the weights dim is data-driven since round 9 (the 5x scale-verify
    // caught the hardcoded literal dim dropping the replica): its
    // distinct-sources build adds ONE source-cardinality-sized exchange
    // on top of the mix agg + output sort
    assert(shuffles(plan("s_weighted_mix")).length <= 3,
      "s_weighted_mix grew a shuffle")
    // the mix's weights dim must broadcast, never shuffle the corpus
    assert(bcasts(plan("s_weighted_mix")).nonEmpty, "weights dim lost its broadcast")
  }

  test("temperature mix: rates broadcast, normalizer window is post-agg source-sized") {
    val p = plan("s_temperature_mix")
    // source-mass agg + one-row normalizer window exchange + membership
    // agg + output sort; the corpus side itself never shuffles
    assert(shuffles(p).length <= 4, "s_temperature_mix grew a shuffle")
    assert(bcasts(p).nonEmpty, "rate table lost its broadcast")
  }

  test("sequence packing: one shuffle for the source window, one agg, one sort") {
    assert(shuffles(plan("s_pack_sequences")).length <= 3)
    // and the packing window is PARTITIONED (no single-partition window)
    val windows = collectAll(plan("s_pack_sequences")) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "packing window lost its source partitioning")
  }

  test("sessionization: one user-id shuffle serves both windows AND the group-by") {
    // lag + running-sum windows and the (user_id, session_id) aggregate all
    // ride the single hash partitioning on user_id; only the output sort
    // adds a range exchange
    val p = plan("w_sessionize_gap")
    assert(shuffles(p).length <= 2, "sessionize grew a shuffle")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
  }

  test("clean-corpus pipeline: key shuffle + source agg + sort, bounded") {
    val p = plan("s_clean_corpus")
    assert(shuffles(p).length <= 3)
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "dedup-winner window must stay partitioned by content key")
  }

  test("bpe apply: segmentation table broadcasts, corpus never shuffles to tokenize") {
    val p = plan("t_bpe_apply")
    assert(bcasts(p).nonEmpty, "bpe apply lost its segmentation broadcast")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "bpe apply must not plan a window")
  }

  test("skew profile / jackknife: aggregates only, no join") {
    Seq("audit_skew_profile", "s_jackknife_blocks").foreach { q =>
      withClue(q) {
        assert(collectAll(plan(q)) {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
        }.isEmpty, s"$q must not plan a join")
      }
    }
  }

  test("full corpus pipeline: two key windows (norm_key, split+source), nothing global") {
    val p = plan("corpus_pipeline_full")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "pipeline windows must stay key-partitioned")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "pipeline must not plan a join")
    assert(shuffles(p).length <= 4, "pipeline grew a shuffle")
  }

  test("wow change / log histogram: windows on collapsed frames, no joins") {
    Seq("w_wow_change", "a_log_histogram").foreach { q =>
      withClue(q) {
        val p = plan(q)
        assert(collectAll(p) {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
        }.isEmpty, s"$q must not plan a join")
        val windows = collectAll(p) {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        assert(windows.forall(_.partitionSpec.nonEmpty),
          s"$q windows must stay partitioned")
      }
    }
  }

  test("market basket: item supports broadcast onto the pair frame, no window") {
    val p = plan("a_market_basket")
    assert(bcasts(p).size >= 2, "basket rule math lost its support broadcasts")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "market basket must not plan a window")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "market basket planned a cartesian product")
  }

  test("markov transitions: normalization window runs on the collapsed state frame") {
    val p = plan("w_markov_transitions")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "markov windows must stay partitioned (user lag / from_t norm)")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "markov transitions must not plan a join")
  }

  test("range checksums: scan-side hashing + one range aggregate, no join/window") {
    val p = plan("audit_range_checksums")
    assert(shuffles(p).length <= 2, "range checksums grew a shuffle")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "range checksums must not plan a join")
  }

  test("group regression: t0 broadcast back, moment sums map-side combinable") {
    val p = plan("a_group_regression")
    assert(bcasts(p).nonEmpty, "regression t0 table lost its broadcast")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "regression must not plan a window")
  }

  test("cohort retention: cohort window shares the user partitioning, sizes broadcast") {
    val p = plan("w_cohort_retention")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "cohort-min window must stay partitioned by user")
    assert(bcasts(p).nonEmpty, "cohort sizes lost their broadcast join")
  }

  test("ewma: one user-key aggregate + sort — fold is scan-side, no join/window") {
    val p = plan("a_ewma_smooth")
    assert(shuffles(p).length <= 2, "ewma grew a shuffle")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "ewma must not plan a join")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "ewma must not plan a window")
  }

  test("random projection: sign matrix broadcast, projection row-local — one sort shuffle") {
    val p = plan("emb_random_proj")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, "projection lost its sign-matrix broadcast")
    assert(shuffles(p).length <= 1, "projection grew a shuffle beyond the output sort")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "projection must not plan a window")
  }

  test("pq adc search: probes broadcast with tables, top-k rides the bounded heap") {
    val p = plan("ann_pq_adc")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, "adc search lost its probe broadcast")
    assert(collectAll(p) {
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
    }.nonEmpty, "adc search lost its bounded-heap top-k aggregate")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "adc search must not plan a window")
  }

  test("pq encode: codebook broadcast as one row, encode row-local — no extra shuffle") {
    val p = plan("emb_pq_encode")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, "pq encode lost its codebook broadcast")
    // codebook collapse (one-row agg) + output sort; the encode fan-out
    // itself is a row-local posexplode
    assert(shuffles(p).length <= 2, "pq encode grew a shuffle")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "pq encode must not plan a window")
  }

  test("keyword search: bounded-heap top-k agg, token-partitioned df window, N broadcast") {
    val p = plan("t_keyword_search")
    assert(collectAll(p) {
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
    }.nonEmpty, "keyword search lost its bounded-heap top-k aggregate")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "df window must stay partitioned by token")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, "doc-count row lost its broadcast")
  }

  test("bpe training: each round's best pair is a one-row sort-limit broadcast, no window") {
    // round 16: merge rounds 1-2 materialize behind per-round lineage
    // cuts (they re-derived the whole merge history each round
    // otherwise), so only the LAST round's shape is visible in the final
    // plan — bpeSegmentation deliberately leaves it un-cut to keep this
    // pin honest; the cut rounds run the identical plan inside their
    // materialization jobs
    val p = plan("t_bpe_train_merges")
    val topk = collectAll(p) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(topk.size >= 1, "bpe best-pair selection lost its sort-limit form")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.size >= 1, "bpe merge rounds lost their best-pair broadcasts")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "bpe training must not plan a window")
  }

  test("count-min: grid collapses to one broadcast row, probes never shuffle to estimate") {
    val p = plan("a_countmin_heavy")
    // the grid row rides a BroadcastNestedLoopJoin (no equi keys); no
    // window anywhere; shuffles: cell agg + exact agg + the two one-row
    // collapses + output sort
    val bnl = collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.nonEmpty, "count-min grid row lost its broadcast")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "count-min must not plan a window")
  }

  test("triangle count: equi wedge joins only — no window, no cartesian") {
    // the degree broadcasts sit UPSTREAM of the oriented-edge
    // localCheckpoint, so the final plan can't show them (documented in
    // the query doc, like dd_minhash_est); what it must show: the wedge
    // and closing joins stay equi-keyed (src / (b,c)) — never cartesian —
    // and nothing plans a window
    val p = plan("g_triangle_count")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.size >= 2, "triangle count lost its wedge/closing equi joins")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "triangle count must not plan a window")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "triangle count planned a cartesian product")
  }

  test("rolling distinct: fan-out rides the collapsed (day,user) frame, no join/window") {
    val p = plan("w_rolling_distinct")
    // (day,user) pre-agg + the count-distinct's two-phase (wday,user)->wday
    // exchanges + output sort; the generator fan-out itself is row-local
    assert(shuffles(p).length <= 4, "rolling distinct grew a shuffle")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "rolling distinct must not plan a join")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "rolling distinct must not plan a window")
  }

  test("snapshot diff: single conditional-agg pass — no join, no window") {
    val p = plan("k_snapshot_diff")
    // one user-key agg exchange + the output range sort, and NOTHING else:
    // the naive two-snapshots-full-outer-join plan is exactly what this
    // query exists to avoid
    assert(shuffles(p).length <= 2, "snapshot diff grew a shuffle")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "snapshot diff must not plan a join")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "snapshot diff must not plan a window")
  }

  test("incremental corpus build: key index broadcast into the anti-join, dedup windows stay keyed") {
    val p = plan("corpus_pipeline_incremental")
    // the arriving batch must probe the (small, kept-key-sized) index via
    // a broadcast LEFT ANTI — a shuffled anti-join here would move the
    // corpus to drop duplicates, the exact thing the index exists to avoid
    assert(bcasts(p).nonEmpty, "key index lost its broadcast anti-join")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "winner windows must stay partitioned by norm_key")
    // batch winner window + union/output sort stages; the history side is
    // checkpoint-materialized once (manifest + index share one derivation)
    assert(shuffles(p).length <= 5, "incremental pipeline grew a shuffle")
  }

  test("bfs levels / k-core peel: iterations checkpoint-bounded, final plan window-free") {
    // each frontier/peel round collapses through localCheckpoint, so the
    // executed plan must stay small and must NOT contain a window — a
    // window appearing here means an iteration regressed to a global rank
    Seq(("g_bfs_levels", 2), ("g_kcore_peel", 4)).foreach { case (q, n) =>
      withClue(q) {
        val p = plan(q)
        assert(collectAll(p) {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }.isEmpty, s"$q planned a window")
        assert(shuffles(p).length <= n, s"$q grew a shuffle")
      }
    }
  }

  test("scd2 interval build / gap interpolation: every window keyed on the entity") {
    // lag/lead run-detection must partition by user — an empty
    // partitionSpec would serialize the whole event stream through one
    // task, the classic window scale-killer
    Seq(("k_scd2_intervals", 3), ("a_gap_interpolate", 3)).foreach { case (q, n) =>
      withClue(q) {
        val p = plan(q)
        val windows = collectAll(p) {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
          s"$q has a global (unpartitioned) window")
        assert(shuffles(p).length <= n, s"$q grew a shuffle")
      }
    }
  }

  test("chi-square: global windows only over the collapsed contingency frame") {
    val p = plan("a_chi_square")
    // the (type × dow) contingency table is an aggregate BEFORE any
    // window; a global window is fine over that bounded frame but must
    // never see raw events — assert every unpartitioned window has an
    // aggregate beneath it
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "a_chi_square lost its windows")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(collectAll(w.child) {
        case h: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => h
      }.nonEmpty, "global window runs over raw rows, not the contingency frame")
    }
  }

  test("ab readout: pure aggregate ladder — no window, no join") {
    val p = plan("a_ab_readout")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "a_ab_readout must not plan a window")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "a_ab_readout must not plan a join")
    assert(shuffles(p).length <= 5, "a_ab_readout grew a shuffle")
  }

  test("hamming ann: probe codes broadcast, rank windows stay per-probe") {
    val p = plan("emb_hamming_topk")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, "probe codes lost their broadcast")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "top-k rank window must stay partitioned by probe")
  }

  test("minhash incremental: window-free probe — index join + per-doc aggregate only") {
    val p = plan("dd_minhash_incremental")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "the band probe must stay a join + aggregate, not a window")
    assert(shuffles(p).length <= 5, "dd_minhash_incremental grew a shuffle")
  }

  test("rfm segments: medians broadcast back; global windows only over collapsed value frames") {
    val p = plan("w_rfm_segments")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.length >= 3, "median one-row frames lost their broadcast")
    collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(collectAll(w.child) {
        case h: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => h
      }.nonEmpty, "a global median window runs over raw users, not the value frame")
    }
  }

  test("zone-map audit: one zone aggregate; ppm window over the collapsed zone frame") {
    val p = plan("audit_zone_map_pruning")
    assert(shuffles(p).length <= 3, "audit_zone_map_pruning grew a shuffle")
    collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(collectAll(w.child) {
        case h: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => h
      }.nonEmpty, "scan-fraction window runs over raw events, not zones")
    }
  }

  test("dup-span removal: merge windows stay per-doc") {
    val p = plan("t_dup_span_removal")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "interval-merge windows must stay partitioned by doc_id")
    assert(shuffles(p).length <= 7, "t_dup_span_removal grew a shuffle")
  }

  test("modularity: community labels broadcast onto the edges; E rollup over the community frame") {
    val p = plan("g_modularity")
    // the node->community dimension rides broadcast on BOTH edge sides —
    // a shuffled label join would move the edge list twice
    assert(bcasts(p).length >= 2, "community labels lost their broadcast")
    collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(collectAll(w.child) {
        case h: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => h
      }.nonEmpty, "E rollup window runs over edges, not the community frame")
    }
  }

  test("group percentiles: one collapsed-frame pass, windows stay per-type") {
    val p = plan("a_group_percentiles")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "percentile windows must stay partitioned by event_type")
    // value-collapse agg + the shared window exchange + output sort
    assert(shuffles(p).length <= 3, "a_group_percentiles grew a shuffle")
  }

  test("gdpr erasure audit: every join broadcasts a bounded side (no shuffled join)") {
    val p = plan("audit_gdpr_erasure")
    // the audit composes one-row rollups and an erased-key probe; a
    // SortMergeJoin/ShuffledHashJoin appearing means a corpus-sized side
    // started shuffling for what must stay a broadcast of bounded state
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.isEmpty, "audit_gdpr_erasure grew a sort-merge join")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isEmpty, "audit_gdpr_erasure grew a shuffled hash join")
  }

  private def joinTypes(p: SparkPlan): Seq[String] = collectAll(p) {
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType.toString
  }

  test("correlated scalar subquery decorrelates: one per-key aggregate, lineitem scanned exactly twice") {
    val p = plan("sq_scalar_small_qty")
    // per-row evaluation would appear as a nested-loop over the fact; the
    // decorrelated form is lineitem(outer) + lineitem(agg) + part = 3 scans
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 3,
      s"expected 3 parquet scans (lineitem x2 + part), got ${scans.length} — " +
        "the correlated subquery stopped decorrelating into a single aggregate")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, "correlated subquery fell back to a nested loop")
  }

  test("EXISTS / NOT EXISTS chain decorrelates to semi + anti joins with the non-equality residual") {
    val p = plan("sq_exists_only_late")
    val types = joinTypes(p)
    assert(types.contains("LeftSemi"), "EXISTS lost its semi join")
    assert(types.contains("LeftAnti"), "NOT EXISTS lost its anti join")
    // the suppkey<>suppkey correlation must ride the join as a residual
    // condition, not force a cartesian
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, "EXISTS chain fell back to a nested loop")
  }

  test("nullable NOT IN plans as a null-aware anti join (3VL without a nested loop)") {
    // the three counts are scalar subqueries in the SELECT list, so their
    // plans hang off expressions — and under AQE each level re-nests, so
    // gather every reachable plan (children, adaptive executedPlans, and
    // expression subqueries, recursively) before collecting
    def allPlans(p: SparkPlan): Seq[SparkPlan] = {
      val adaptees = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
      val subs = (p +: adaptees).flatMap(_.subqueriesAll)
      p +: (adaptees ++ subs).flatMap(allPlans)
    }
    val naaj = allPlans(plan("sq_not_in_3vl")).flatMap(collectAll(_) {
      case j: BroadcastHashJoinExec if j.isNullAwareAntiJoin => j
    })
    assert(naaj.nonEmpty,
      "the nullable NOT IN lost its null-aware anti join — 3VL is either " +
        "wrong or running as a per-row nested loop")
  }

  test("nested IN + window threshold: semi join on the part family, window over the aggregated dimension frame") {
    val p = plan("sq_nested_in_topshare")
    assert(joinTypes(p).contains("LeftSemi"), "partkey IN lost its semi join")
    // the global window runs over the ALREADY-AGGREGATED supplier frame —
    // its child must contain the supplier-key aggregate, never raw lineitem
    collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(collectAll(w.child) {
        case h: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => h
      }.nonEmpty, "share window must run over the aggregated supplier frame")
    }
  }

  test("FIFO costing: one partkey shuffle serves both windows AND the per-part rollup") {
    val p = plan("k_fifo_costing")
    // partkey exchange + brand agg exchange + output sort = 3; a fourth
    // means the per-part aggregate stopped reusing the window partitioning
    assert(shuffles(p).length <= 3, "k_fifo_costing grew a shuffle")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "FIFO windows must stay partitioned by part")
    assert(bcasts(p).nonEmpty, "brand dimension lost its broadcast")
  }

  test("lateral ORDER BY+LIMIT decorrelates to a rank window partitioned by the correlation key") {
    val p = plan("sq_lateral_topk")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the correlated LIMIT lost its per-key rank window")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, "lateral subquery fell back to a per-row nested loop")
  }

  test("dynamic partition pruning: the fact scan's PartitionFilters carry a runtime dynamicpruning subquery") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dpp-spec").toFile
    try {
      val p = DataOpsQueries.buildDppJoin(spark, sfSmoke, tmp)
        .queryExecution.executedPlan
      val prunedScans = collectAll(p) {
        case scan: org.apache.spark.sql.execution.FileSourceScanExec
          if scan.partitionFilters.exists(_.toString.toLowerCase.contains("dynamicpruning")) => scan
      }
      assert(prunedScans.nonEmpty,
        "the day-partitioned fact scan lost its dynamicpruning partition filter — " +
          "the join reads every day directory instead of the qualifying subset")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(tmp); ()
    }
  }

  test("null-safe join plans as a hash join (EqualNullSafe coalesced into keys, no nested loop)") {
    val p = plan("j_null_safe_join")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty && collectAll(p) {
      case j: org.apache.spark.sql.execution.CoGroupExec => j
    }.isEmpty, "null-safe equality stopped planning as an equi-join")
    assert(bcasts(p).nonEmpty, "the keyed rollup join lost its broadcast")
  }

  test("bitmap distinct: block rollups join broadcast; bounded shuffles (blocks, not raw ids, cross the wire)") {
    val p = plan("a_bitmap_distinct")
    // bitmap two-level agg (2) + countDistinct expand pair (2) + output
    // sort (1); a sixth shuffle means a rollup stopped being partial
    assert(shuffles(p).length <= 5, "a_bitmap_distinct grew a shuffle")
    assert(bcasts(p).nonEmpty, "the per-key rollup join lost its broadcast")
  }

  test("scalar-stats + NOT EXISTS: anti join present, stats ride a one-row broadcast") {
    val p = plan("sq_exists_segment")
    assert(joinTypes(p).contains("LeftAnti"), "NOT EXISTS lost its anti join")
    assert(collectAll(p) {
      case e: BroadcastExchangeExec => e
    }.nonEmpty, "the one-row stats frame lost its broadcast")
  }

  test("pattern match: one user-keyed shuffle serves the lag/lead window and the aggregate") {
    val p = plan("w_pattern_match")
    assert(shuffles(p).length <= 2, "w_pattern_match grew a shuffle") // user key + output sort
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the lag/lead window must stay partitioned per user")
  }

  test("entity resolution: pair generation rides the blocking equi-join, never an all-pairs nested loop") {
    val p = plan("dd_entity_resolution")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }.isEmpty, "ER pair generation degraded to all-pairs — the blocking key stopped driving the join")
  }

  test("benford audit: one corpus scan, 9-key aggregate; all frame math over the digit frame") {
    val p = plan("audit_benford_digits")
    // digit agg + single-partition 9-row frame + output sort
    assert(shuffles(p).length <= 3, "audit_benford_digits grew a shuffle")
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.length <= 1, "benford must derive N from the digit frame, not a second scan")
  }

  test("IVM merge: the full-outer join reuses both aggregates' custkey partitioning (3 exchanges total)") {
    val p = plan("k_ivm_aggregate")
    // base-view agg + delta agg + output sort; a 4th exchange means the
    // merge join stopped reusing the aggregates' hash partitioning
    assert(shuffles(p).length <= 3, "k_ivm_aggregate's merge grew an exchange")
    assert(joinTypes(p).contains("FullOuter"), "IVM merge lost its full-outer join")
  }

  test("tfidf: key-bucketed shuffles only (tf agg, df window, rank window, sort); both windows stay partitioned") {
    val p = plan("t_tfidf_topterms")
    // tf partial->final agg + df token window + rank doc window + output
    // sort + the ONE-ROW n_docs count's own final-agg exchange = 5; the
    // rank<=3 predicate rides WindowGroupLimit into the doc shuffle
    assert(shuffles(p).length <= 5, "t_tfidf_topterms grew a shuffle")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }.nonEmpty, "the top-3 rank filter lost its WindowGroupLimit pushdown")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "tfidf windows must stay partitioned (term / doc) — a global window would serialize the vocab")
    assert(collectAll(p) { case e: BroadcastExchangeExec => e }.nonEmpty,
      "the one-row N frame lost its broadcast")
  }

  test("grid spatial join: cell-bucketed candidates ride a broadcast equi-join, never a distance nested loop") {
    val p = plan("geo_grid_join")
    assert(bcasts(p).nonEmpty, "the 9x-replicated supplier side lost its broadcast")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, "spatial join degraded to an all-pairs nested loop")
    // per-customer aggregate + output sort only
    assert(shuffles(p).length <= 2, "geo_grid_join grew a shuffle")
  }

  test("trajectory stats: one user-keyed shuffle serves the lag window and the aggregate") {
    val p = plan("geo_trajectory_stats")
    assert(shuffles(p).length <= 2, "geo_trajectory_stats grew a shuffle") // user key + output sort
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the lag window must stay partitioned per user (a global window would serialize the corpus)")
  }

  test("rank statistics (KS / Mann-Whitney): corpus collapses to distinct values BEFORE any window") {
    // the scale contract: the order statistic runs over the VALUE DOMAIN
    // (distinct cents / quantities per group), never the row count — so
    // the first operator below the windows must be the collapsing
    // aggregate, and every window stays group-partitioned
    Seq("a_ks_test", "a_mann_whitney").foreach { q =>
      withClue(q) {
        val p = plan(q)
        val windows = collectAll(p) {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
          s"$q: a cumulative window lost its group partitioning")
        // collapse agg (1) + group window (1) + output sort (1); the
        // final per-group rollup rides the window's partitioning
        assert(shuffles(p).length <= 3, s"$q grew a shuffle: ${shuffles(p).length}")
      }
    }
  }

  test("skyline: 2D frontier is two stacked windows over the distinct-point frame, no self-join") {
    val p = plan("a_pareto_skyline")
    // the classic quadratic anti-join must NOT appear — no join at all
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "skyline planned a join (quadratic formulation regressed in)")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "skyline windows must stay brand-partitioned")
    assert(shuffles(p).length <= 3, "a_pareto_skyline grew a shuffle")
  }

  test("cube margins: ONE scan + Expand serves all four granularities") {
    val p = plan("a_cube_margins")
    assert(collectAll(p) {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }.nonEmpty, "CUBE lost its Expand (per-granularity rescans regressed in)")
    // partial->final agg exchange + output sort; map-side combine keeps
    // the expanded rows from shuffling raw
    assert(shuffles(p).length <= 2, "a_cube_margins grew a shuffle")
  }

  test("haar decomposition: level dim and day-zero ride broadcasts; only key-sized exchanges") {
    val p = plan("a_haar_decomposition")
    // the 6-row level frame and the one-row min-day frame must both
    // broadcast (nested-loop cross with a broadcast side, never a shuffle)
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.length >= 2, "haar lost a broadcast (level dim or day-zero frame)")
    // (type, day) collapse + min-day rollup + coefficient agg + output
    // sort — all key-cardinality-sized
    assert(shuffles(p).length <= 4, "a_haar_decomposition grew a shuffle")
  }

  test("OHLC bars: endpoint extraction via struct min/max — NO window, NO per-group sort") {
    val p = plan("w_ohlc_vwap")
    // the whole point: open/close come from hash aggregation over
    // (ts, id, value) structs, so the plan must contain zero WindowExec
    // and zero SortExec below the aggregate
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "w_ohlc_vwap grew a window (row_number formulation regressed in)")
    assert(shuffles(p).length <= 2, "w_ohlc_vwap grew a shuffle") // agg + output sort
  }

  test("CUSUM: closed-form prefix windows stay type-partitioned over the collapsed daily frame") {
    val p = plan("w_cusum_alarm")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "CUSUM windows must stay partitioned per event type")
    // (type, day) collapse + type window + output sort
    assert(shuffles(p).length <= 3, "w_cusum_alarm grew a shuffle")
  }

  test("prefix-filter join: every join is hash-keyed (prefix token / doc id) — no nested loop, no hint") {
    val p = plan("dd_prefix_filter_join")
    // the shingling/ranking stages live behind the two localCheckpoint
    // materializations; the visible plan is candidate self-join +
    // confirm joins, all of which must be EQUI joins (a nested loop here
    // means the prefix-token key was lost and the join went all-pairs)
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "prefix-filter join planned a cartesian product")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "prefix-filter join degraded to a nested loop")
    // pair-distinct aggregate + output sort; the joins are AQE-free
    // (deliberately hint-less) and broadcast at spec scale
    assert(shuffles(p).length <= 3, s"dd_prefix_filter_join grew a shuffle: ${shuffles(p).length}")
  }

  test("readability: row-local scoring, only the (lang, bucket) rollup shuffles") {
    val p = plan("t_readability")
    assert(collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "t_readability grew a window")
    assert(shuffles(p).length <= 2, "t_readability grew a shuffle") // rollup + output sort
  }

  test("sweep-line concurrency: boundary-delta aggregate + one group window, no interval join") {
    val p = plan("w_max_concurrency")
    assert(joinTypes(p).isEmpty,
      "w_max_concurrency grew a join (interval self-join regressed in)")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "sweep windows must stay priority-partitioned")
    // delta agg + window repartition + output sort
    assert(shuffles(p).length <= 3, "w_max_concurrency grew a shuffle")
  }

  test("changepoint: day-domain collapse before any window; no joins") {
    val p = plan("a_changepoint_binary")
    assert(joinTypes(p).isEmpty, "a_changepoint_binary grew a join")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "changepoint windows must stay priority-partitioned")
    assert(shuffles(p).length <= 4, "a_changepoint_binary grew a shuffle")
  }

  test("theil-sen: the pairwise stage self-joins the collapsed day frame as an equi join") {
    val p = plan("a_theil_sen_daily")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "theil-sen pair join planned a cartesian product")
    // (type, day) collapse x2 branches may reuse one exchange; pair join
    // + rank window + final rollup + output sort
    assert(shuffles(p).length <= 6, s"a_theil_sen_daily grew a shuffle: ${shuffles(p).length}")
  }

  test("largest-remainder: fact collapses to the nation frame before windows; nation dim broadcasts") {
    val p = plan("a_largest_remainder_alloc")
    assert(bcasts(p).nonEmpty, "a_largest_remainder_alloc lost its nation broadcast")
    assert(shuffles(p).length <= 5, "a_largest_remainder_alloc grew a shuffle")
  }

  test("FD audit: union aggregates once; modal election windows the distinct-pair frame") {
    val p = plan("audit_fd_violations")
    assert(joinTypes(p).isEmpty, "audit_fd_violations grew a join")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "FD windows must stay (fd, lhs)-partitioned")
    assert(shuffles(p).length <= 4, "audit_fd_violations grew a shuffle")
  }

  test("compaction bins: manifest collapse, then frame-sized prefix window + bin rollup") {
    val p = plan("k_compaction_bins")
    assert(joinTypes(p).isEmpty, "k_compaction_bins grew a join")
    // day collapse + (global-over-manifest) window + bin rollup + sort
    assert(shuffles(p).length <= 4, "k_compaction_bins grew a shuffle")
  }

  test("phrase positions: ONE corpus scan; phrases ride a broadcast; argmax over the value domain") {
    val p = plan("t_phrase_positions")
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1,
      s"t_phrase_positions must scan documents exactly once, saw ${scans.length}")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, "t_phrase_positions lost its phrase broadcast")
    assert(shuffles(p).length <= 3, "t_phrase_positions grew a shuffle")
  }

  test("symspell blocking: variant join is equi-keyed — no nested loop, no cartesian") {
    val p = plan("dd_symspell_neighbors")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "symspell candidate join planned a cartesian product")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "symspell candidate join degraded to a nested loop")
  }

  test("bellman-ford SSSP: every relax round is an equi join — no cartesian anywhere") {
    val p = plan("g_sssp_bellman")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "SSSP relax planned a cartesian product")
  }

  test("survival hazard: duration build + value-domain collapse; windows stay priority-partitioned") {
    val p = plan("a_survival_hazard")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "survival windows must stay priority-partitioned")
    // orderkey join exchanges + duration agg + (grp, t) collapse +
    // window repartition + output sort
    assert(shuffles(p).length <= 6, s"a_survival_hazard grew a shuffle: ${shuffles(p).length}")
  }

  test("capture-recapture: one scan, row-local membership, only the priority rollup shuffles") {
    val p = plan("a_capture_recapture")
    assert(joinTypes(p).isEmpty, "a_capture_recapture grew a join")
    assert(shuffles(p).length <= 2, "a_capture_recapture grew a shuffle")
  }

  test("relational division: correlated scalar DECORRELATES — aggregate + join, no per-row subquery loop") {
    val p = plan("sq_relational_division")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "division planned a cartesian product")
    // decorrelation evidence: the coverage count appears as a real
    // aggregate operator in the physical plan (a correlated loop would
    // instead re-run a subquery per customer row)
    assert(collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }.nonEmpty, "division lost its decorrelated coverage aggregate")
  }

  test("shapley: corpus feeds two keyed aggregates; the lattice walk rides broadcasts only") {
    val p = plan("a_shapley_channels")
    // events scanned twice (mask build + conversion flags), channel dim
    // + its count guard once each — the 16-row lattice must add ZERO
    // further corpus scans
    val scans = collectAll(p) {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.length <= 4,
      s"a_shapley_channels re-scans the corpus: ${scans.length} scans")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "shapley lattice walk planned a non-broadcast cartesian")
  }

  test("little's law: boundary aggregate + one lead/cumsum window pass, windows stay partitioned") {
    val p = plan("w_littles_law")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "little's-law windows must stay priority-partitioned")
    assert(shuffles(p).length <= 6, s"w_littles_law grew a shuffle: ${shuffles(p).length}")
  }

  test("sorted neighborhood: rank-adjacency pairing is equi-join only") {
    val p = plan("dd_sorted_neighborhood")
    assert(collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "SNM pairing planned a cartesian product")
    assert(collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "SNM pairing degraded to a nested loop (OR-join regressed in)")
  }

  test("max drawdown: three stacked type-partitioned windows over the collapsed daily frame, no joins") {
    val p = plan("w_max_drawdown")
    assert(joinTypes(p).isEmpty, "w_max_drawdown grew a join")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "drawdown windows must stay type-partitioned")
    assert(shuffles(p).length <= 3, s"w_max_drawdown grew a shuffle: ${shuffles(p).length}")
  }

  test("median imputation: nation-partitioned rank window; the 25-row median dim broadcasts back") {
    val p = plan("k_impute_group_median")
    assert(bcasts(p).nonEmpty, "k_impute_group_median lost its median broadcast")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "imputation rank window must stay nation-partitioned")
    assert(shuffles(p).length <= 4, s"k_impute_group_median grew a shuffle: ${shuffles(p).length}")
  }

  test("kNN spatial join: supplier cells broadcast; ranking window stays customer-partitioned") {
    val p = plan("geo_knn_ranked")
    assert(bcasts(p).nonEmpty, "geo_knn_ranked lost its cell broadcast")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "kNN ranking window must stay customer-partitioned")
    assert(shuffles(p).length <= 2, "geo_knn_ranked grew a shuffle")
  }

  test("adaptive kNN: NO window/sort over the candidate set — bounded heap with map-side partial combine") {
    // the density-adaptive twin's whole point: under densification the
    // in-radius candidate set is quadratic, so no Sort or Window may ever
    // see it — the top-3 must fold into partial ObjectHashAggregate
    // buffers inside the join's own stage, and the shuffle carries heaps
    val p = plan("geo_knn_adaptive")
    assert(bcasts(p).nonEmpty, "geo_knn_adaptive lost its cell broadcast")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      "geo_knn_adaptive must not rank with a window — that re-grows the candidate shuffle")
    val aggs = collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(aggs.exists(_.aggregateExpressions.exists(ae =>
      ae.aggregateFunction.isInstanceOf[graft.plans.TopKByScoreAggregate] &&
        ae.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
      "top-3 heap must run in PARTIAL mode (map-side, candidate-stage-local)")
    // the only sort allowed is the k-bounded final output's ORDER BY
    assert(shuffles(p).length <= 2, "geo_knn_adaptive grew a shuffle")
  }
}
