package graft.pipelines

import graft.functions.Text
import graft.ops.{ConnectedComponents, NearDup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end dedup pipeline as ONE composed job — the dedup mirror of
  * [[CorpusPipeline]]: exact-duplicate star edges + LSH-candidate →
  * exact-confirm near-dup pairs → connected components → canonical keeper
  * per cluster → keeper-only corpus. Every stage IS the oracle-checked
  * operator from the catalog (`dd_exact_groups` keying, `dd_lsh_confirm`
  * via the shared [[NearDup]], `dd_conn_components` via the shared
  * [[ConnectedComponents]]), wired end-to-end so the pipeline cannot
  * drift from what the driver verifies; the composition itself is
  * oracle-checked as `dd_pipeline_keepers`.
  *
  * Semantics mirror the reference's exactly-once + canonical-pick pattern
  * (J5 dispatched-set gating, A1-style min-id selection —
  * `/root/reference/backend/dags/dag_bakery_system_to_jde.py:445-487`):
  * within each similarity cluster exactly one document (the min doc_id)
  * survives; every non-keeper maps to exactly one keeper.
  *
  * Scale shape: exact edges are star-form (linear in input, never
  * all-pairs cliques); near-dup edges are the collision-sized confirmed
  * set; the CC loop is one shuffle-join + min-agg per round with
  * per-round checkpointing. Nothing here is quadratic in the corpus and
  * nothing but the CC label table shuffles more than once.
  */
object DedupPipeline {
  /** @param shingleSize  words per shingle for the near-dup detector
    * @param confirmThreshold  exact-Jaccard cut for a confirmed near-dup */
  case class Config(
      shingleSize: Int = 3,
      nSeeds: Int = 8,
      bandSize: Int = 4,
      confirmThreshold: Double = 0.5)

  /** Per-document cluster assignment: `doc_id`, `keeper` (the cluster's
    * min doc_id — every doc in a cluster gets the same one), `is_keeper`.
    */
  def assignments(documents: DataFrame, cfg: Config = Config()): DataFrame = {
    val keyed = documents
      .select(col("doc_id"), Text.normalizedKey(col("text")).as("norm_key"))
      .persist()
    // exact duplicates: star edges within each normalized-content key
    // group (2(k-1) edges per k-group, clique connectivity)
    val exactEdges = ConnectedComponents.starEdges(keyed, "doc_id", "norm_key")
    // near duplicates: LSH candidates confirmed by row-local exact
    // Jaccard — already materialized collision-sized
    val confirmed = NearDup.confirmedPairs(
      documents, cfg.shingleSize, cfg.nSeeds, cfg.bandSize, cfg.confirmThreshold)
    val nearEdges = confirmed
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(confirmed.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val (labels, _) = ConnectedComponents.run(
      keyed, exactEdges.unionByName(nearEdges), "doc_id")
    keyed.unpersist()
    // min-label CC over min-id star roots ⇒ the component label IS the
    // cluster's min doc_id — the canonical keeper
    labels.select(
      col("doc_id"),
      col("component").as("keeper"),
      (col("doc_id") === col("component")).as("is_keeper"))
  }

  /** The deduplicated corpus: keeper rows only, all columns intact. */
  def keeperCorpus(documents: DataFrame, assign: DataFrame): DataFrame =
    documents.join(
      assign.filter(col("is_keeper")).select("doc_id"), Seq("doc_id"), "left_semi")

  case class Funnel(raw: Long, keepers: Long, removed: Long)

  /** Audit counts — ONE agg pass over the assignment table. */
  def funnel(assign: DataFrame): Funnel = {
    val r = assign.agg(
      count(lit(1)).as("raw"),
      count_if(col("is_keeper")).as("keepers")).first()
    Funnel(r.getLong(0), r.getLong(1), r.getLong(0) - r.getLong(1))
  }
}
