package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan

/** Two invariance claims the scale docs make, proven by running the SAME
  * call sites under changed physical conditions and comparing results.
  *
  * 1. Broadcast fallback: the dimension/done-set joins (j1, j5) are
  *    documented as "broadcast today; when the build side outgrows the
  *    threshold the same query flips to a shuffled join — call sites
  *    unchanged". With autoBroadcastJoinThreshold=-1 the planner must
  *    pick a non-broadcast join AND produce identical rows.
  *
  * 2. Partition invariance: the deterministic corpus-assembly operators
  *    (hash split, epoch shuffle, pack) advertise bit-identical output
  *    under any partitioning (the reason they hash ids instead of using
  *    rand()). Running with shuffle.partitions=5 vs the suite default
  *    must produce identical rows.
  */
class StrategyInvarianceSpec extends SparkSpec {

  private def rows(name: String): Seq[String] =
    Catalog.byName(name).build(spark, sfSmoke)
      .collect().map(_.toString).toSeq

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val self = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
    }.flatten
    self ++ nested
  }

  private def withConf[A](key: String, value: String)(f: => A): A = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try f
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("broadcast-disabled twin plans a shuffled join and matches row-for-row") {
    // j5's done-set is the build side DOCUMENTED as outgrowing broadcast
    // (dispatch history only grows); it carries no hint, so the planner
    // must flip it to a shuffled anti join when the threshold disappears.
    // j1 is deliberately NOT here: its `broadcast(part)` hint pins the
    // strategy for a genuinely bounded dimension — a hint the threshold
    // cannot (and should not) unpin.
    Seq("j5_anti_dispatched").foreach { q =>
      withClue(q) {
        val withBcast = rows(q)
        withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
          val df = Catalog.byName(q).build(spark, sfSmoke)
          val p = df.queryExecution.executedPlan
          val bhj = collectAll(p) {
            case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
          }
          assert(bhj.isEmpty,
            s"$q still broadcasts with the threshold disabled — fallback untested")
          val joins = collectAll(p) {
            case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
          }
          assert(joins.nonEmpty, s"$q lost its join under fallback")
          assert(df.collect().map(_.toString).toSeq === withBcast,
            s"$q changes rows when the join strategy flips")
        }
      }
    }
  }

  test("Q9 rollup: orders fact-fact join flips to a shuffled join, row-identical") {
    // j_q9_profit_rollup's dimension joins are HINTED broadcast (bounded
    // dims — the threshold should not unpin them), but the lineitem ⋈
    // orders join carries no hint: at smoke scale the planner broadcasts
    // tiny orders, at 100 TB it must flip to a shuffled join. Execute the
    // flip: threshold disabled, the orders join plans non-broadcast while
    // the two dim hints hold, and the rows are identical.
    val q = "j_q9_profit_rollup"
    val withBcast = rows(q)
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val df = Catalog.byName(q).build(spark, sfSmoke)
      val p = df.queryExecution.executedPlan
      val bhj = collectAll(p) {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bhj.length >= 2, "the hinted dimension broadcasts were unpinned")
      val nonBcast = collectAll(p) {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if !j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec] => j
      }
      assert(nonBcast.nonEmpty,
        "orders join still broadcasts with the threshold disabled — fallback untested")
      assert(df.collect().map(_.toString).toSeq === withBcast,
        s"$q changes rows when the orders join flips to shuffle")
    }
  }

  test("geo spatial joins flip to cell-keyed shuffle joins, row-identical") {
    // geo_grid_join / geo_knn_ranked hard-hinted broadcast(sg) through
    // round 11 while their docs claimed "at equal-sized sides the same
    // plan becomes a cell-keyed shuffle join" — an explicit hint is
    // exactly what makes that claim false (AQE cannot unpin it; past the
    // broadcast ceiling the hinted job dies instead of degrading). The
    // hints are gone; execute the degradation: with the threshold
    // disabled both queries must plan ZERO broadcast joins (the pairs
    // join shuffles on the cell key) and return exactly the
    // auto-broadcast rows.
    Seq("geo_grid_join", "geo_knn_ranked").foreach { q =>
      withClue(q) {
        val withBcast = rows(q)
        withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
          val df = Catalog.byName(q).build(spark, sfSmoke)
          val p = df.queryExecution.executedPlan
          val bhj = collectAll(p) {
            case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
            case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
          }
          assert(bhj.isEmpty,
            s"$q still broadcasts with the threshold disabled — the hint is back?")
          val joins = collectAll(p) {
            case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
          }
          assert(joins.nonEmpty, s"$q lost its cell join under fallback")
          assert(df.collect().map(_.toString).toSeq === withBcast,
            s"$q changes rows when the cell join flips to shuffle")
        }
      }
    }
  }

  test("NearDup confirm flips to shuffled joins with hints stripped, row-identical") {
    // The near-dup confirm path (dd_lsh_confirm / dd_minhash_est /
    // DedupPipeline) force-broadcasts the candidate-derived side
    // (NearDup.scala) — collision-sized at every measured scale, but a
    // hint is unconditional: past the 8 GB broadcast ceiling the hinted
    // job dies. This executes the degradation path: hintBroadcast=false
    // + threshold disabled must plan ZERO broadcast joins (everything
    // shuffles on the doc keys) and return exactly the hinted rows —
    // converting the one remaining scale-killer candidate into a proven
    // fallback, the same proof j5 carries.
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("doc_a", "doc_b").collect().map(_.toString).toSeq
    val hinted = rowsOf(graft.ops.NearDup.confirmedPairs(docs))
    assert(hinted.nonEmpty, "smoke corpus produced no confirmed pairs — fallback proof vacuous")
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      // confirmedPairs localCheckpoints its result, which erases the
      // join lineage — inspect the pre-checkpoint frame instead
      val (planDf, base) = graft.ops.NearDup.confirmPlan(docs, hintBroadcast = false)
      val p = planDf.queryExecution.executedPlan
      val bhj = collectAll(p) {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
        case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
      }
      assert(bhj.isEmpty,
        "NearDup still broadcasts with hints stripped and the threshold disabled")
      val joins = collectAll(p) {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.nonEmpty, "NearDup lost its joins under fallback")
      val fallback = rowsOf(planDf)
      base.unpersist()
      assert(fallback === hinted,
        "NearDup changes rows when the confirm joins flip to shuffle")
    }
  }

  test("deterministic sampling/packing is partition-count invariant") {
    Seq("s_hash_split", "s_epoch_shuffle", "s_pack_sequences",
      "dd_exact_groups").foreach { q =>
      withClue(q) {
        val default = rows(q)
        val narrow = withConf("spark.sql.shuffle.partitions", "5") { rows(q) }
        assert(narrow === default,
          s"$q output depends on the shuffle partition count")
      }
    }
  }

  test("sequential folds and sketch grids are partition-count invariant") {
    // the round-8 ordered-fold / grid operators advertise results
    // independent of physical parallelism: the EWMA fold sorts its
    // collected sequence before folding, the snapshot diff's struct-max
    // is commutative, the count-min grid is a sum (algebraic), and the
    // BPE merge choice is a global sort-limit. shuffle.partitions=5 vs
    // the suite default must produce identical rows — executed, not
    // asserted from the plan.
    Seq("a_ewma_smooth", "k_snapshot_diff", "a_countmin_heavy",
      "t_bpe_train_merges").foreach { q =>
      withClue(q) {
        val default = rows(q)
        val narrow = withConf("spark.sql.shuffle.partitions", "5") { rows(q) }
        assert(narrow === default,
          s"$q output depends on the shuffle partition count")
      }
    }
  }

  test("sketches, carries, and fingerprints are partition-count invariant") {
    // the round-8 fourth-wave operators make the same claim each its own
    // way: HLL registers and theta samples are order-free (max / bounded
    // heap), the union-scan carry orders explicitly by (ts, kind), the
    // phash groups on decoded fingerprints, and the island numbering
    // orders by day within each user. Executed at shuffle.partitions=5
    // vs the suite default.
    Seq("a_hll_distinct", "a_theta_intersect", "j_scd2_lookup",
      "mm_phash_dedup", "w_streak_detection").foreach { q =>
      withClue(q) {
        val default = rows(q)
        val narrow = withConf("spark.sql.shuffle.partitions", "5") { rows(q) }
        assert(narrow === default,
          s"$q output depends on the shuffle partition count")
      }
    }
  }

  test("ER blocking joins flip to shuffled strategies and stay row-identical") {
    // the round-10 candidate generators (symmetric-delete variant join,
    // SNM rank-adjacency joins) carry no hints — at spec scale they
    // broadcast; past the threshold the SAME call sites must plan
    // non-broadcast joins and return the identical candidate/confirm
    // rows. This is the j5/NearDup degradation proof extended to the
    // two new blocking schemes.
    Seq("dd_symspell_neighbors", "dd_sorted_neighborhood").foreach { q =>
      withClue(q) {
        val withBcast = rows(q)
        withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
          val df = Catalog.byName(q).build(spark, sfSmoke)
          val p = df.queryExecution.executedPlan
          val flipped = df.collect().map(_.toString).toSeq
          val bhj = collectAll(p) {
            case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
          }
          assert(bhj.isEmpty,
            s"$q still planned a broadcast join with the threshold disabled")
          assert(flipped === withBcast,
            s"$q rows changed under the shuffled-join strategy")
        }
      }
    }
  }

  test("rank statistics and lattice walks are partition-count invariant") {
    // the round-10 third-session operators each make the claim their own
    // way: the changepoint argmax tie-breaks on day, Theil-Sen ranks with
    // a total (slope, d1, d2) key, the apportionment ranks remainders
    // with a key tiebreak, the Shapley lattice is a sum over a fixed
    // 16-row frame, and the sweep-line cumsum orders by day. Executed at
    // shuffle.partitions=5 vs the suite default.
    Seq("a_changepoint_binary", "a_theil_sen_daily",
      "a_largest_remainder_alloc", "a_shapley_channels",
      "w_max_concurrency").foreach { q =>
      withClue(q) {
        val default = rows(q)
        val narrow = withConf("spark.sql.shuffle.partitions", "5") { rows(q) }
        assert(narrow === default,
          s"$q output depends on the shuffle partition count")
      }
    }
  }
}
