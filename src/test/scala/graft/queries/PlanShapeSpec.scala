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

  private def shuffles(p: SparkPlan) = collectAll(p) { case e: ShuffleExchangeExec => e }
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

  test("blocked jaccard never shuffles the pair fan-out") {
    // broadcast pair join: shuffles only for the final ordered output
    assert(shuffles(plan("dd_ngram_jaccard")).length <= 1)
  }

  test("scan-side operators have at most the output-sort shuffle") {
    Seq("t_token_quality", "t_fingerprints", "f5_f7_transaction_ids",
      "mm_media_stats").foreach { q =>
      withClue(q) { assert(shuffles(plan(q)).length <= 1, s"$q grew a shuffle") }
    }
  }

  test("top-k latest plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("w5_topk_latest").toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
