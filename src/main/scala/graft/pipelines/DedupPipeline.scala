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
  * all-pairs cliques); near-dup detection runs on ONE [[representatives
  * representative]] per token-identical class, so an exact-duplicate
  * group of any size contributes exactly one document to the LSH pairing
  * step (a k-member group would otherwise land k identical signatures in
  * the same band and pay k(k-1)/2 candidate pairs — at web-crawl scale a
  * 10⁶-member boilerplate cluster means ~5×10¹¹ pairs, a job-killer);
  * near-dup edges are the collision-sized confirmed set; the CC loop is
  * one shuffle-join + min-agg per round with per-round checkpointing.
  * Nothing here is quadratic in the corpus OR in any duplicate-group
  * size, and nothing but the CC label table shuffles more than once.
  */
object DedupPipeline {
  /** @param shingleSize  words per shingle for the near-dup detector
    * @param confirmThreshold  exact-Jaccard cut for a confirmed near-dup
    * @param maxBandGroup  defense-in-depth hot-band cap forwarded to
    *   [[NearDup.confirmedPairs]]: with representatives already
    *   collapsing exact duplicates, a band group larger than this can
    *   only be NEAR-identical templated spam — drop it before the
    *   quadratic pairing (the exact path still dedups true duplicates
    *   inside it). None = no cap (the oracle-checked default). */
  case class Config(
      shingleSize: Int = 3,
      nSeeds: Int = 8,
      bandSize: Int = 4,
      confirmThreshold: Double = 0.5,
      maxBandGroup: Option[Int] = None)

  /** One representative document (min doc_id) per TOKEN-SEQUENCE class —
    * the frame the near-dup detector actually pairs over. Token identity
    * (`lower(trim(text))` — whitespace tokens joined on the same single
    * space they were split on, so the md5 is taken directly on the
    * normalized string) is exactly the granularity [[NearDup]] sees:
    * same tokens ⇒ same shingle set ⇒ same minhash signature, band keys,
    * and Jaccard against every other document. Collapsing each class to
    * its min-id member therefore changes NOTHING about which clusters
    * form (see [[assignments]]' invariance note) while making the LSH
    * pairing linear in duplicate-group size. One hash-groupBy with
    * map-side partial min — a 10⁶-member group combines to one row per
    * map partition before the shuffle. */
  def representatives(documents: DataFrame): DataFrame =
    documents
      .select(md5(lower(trim(col("text")))).as("__tok_key"),
        col("doc_id"), col("text"))
      .groupBy("__tok_key")
      .agg(min("doc_id").as("doc_id"),
        min_by(col("text"), col("doc_id")).as("text"))
      .select("doc_id", "text")

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
    // near duplicates: detected over ONE representative per token class,
    // then LSH candidates confirmed by row-local exact Jaccard — already
    // materialized collision-sized. Cluster-closure INVARIANCE of the
    // representative collapse: for any full-corpus confirmed pair (x,y),
    // rep(x)/rep(y) have token-identical text to x/y, hence the same
    // band keys (they still collide) and the same Jaccard (the pair
    // (rep(x),rep(y)) is still confirmed — or rep(x)==rep(y), token-
    // identical); and same tokens ⇒ same word set ⇒ same norm_key, so
    // the star edges connect every member to its representative. Every
    // full-corpus edge is therefore a path in the reduced graph and
    // vice versa — identical components, linear pairing work.
    val confirmed = NearDup.confirmedPairs(
      representatives(documents), cfg.shingleSize, cfg.nSeeds, cfg.bandSize,
      cfg.confirmThreshold, cfg.maxBandGroup)
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
