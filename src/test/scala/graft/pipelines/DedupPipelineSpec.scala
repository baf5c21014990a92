package graft.pipelines

import graft.SparkSpec
import graft.functions.Text
import graft.ops.NearDup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** End-to-end dedup: exact + near-dup edges -> connected components ->
  * canonical keeper -> keeper-only corpus, with the funnel invariants the
  * composition must satisfy (every non-keeper maps to exactly one keeper
  * in its own cluster; dedup actually removed the duplicates it claimed).
  */
class DedupPipelineSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfSmoke)
  private lazy val assign = DedupPipeline.assignments(docs).persist()

  test("total function: every document gets exactly one keeper assignment") {
    assert(assign.count() === docs.count())
    assert(assign.select("doc_id").distinct().count() === docs.count())
    assert(assign.filter(col("keeper").isNull).count() === 0)
  }

  test("keepers are fixpoints and every keeper id is a real document") {
    // a keeper's keeper is itself; non-keepers never appear as keepers
    assert(assign.filter(col("is_keeper") && col("keeper") =!= col("doc_id")).count() === 0)
    assert(assign.filter(!col("is_keeper") && col("keeper") === col("doc_id")).count() === 0)
    val keeperIds = assign.select(col("keeper").as("doc_id")).distinct()
    assert(keeperIds.join(assign.filter(col("is_keeper")), "doc_id", "left_anti").count() === 0)
  }

  test("keeper is the min doc_id of its cluster (A1-style canonical pick)") {
    val bad = assign.groupBy("keeper").agg(min("doc_id").as("mn"))
      .filter(col("keeper") =!= col("mn"))
    assert(bad.count() === 0)
  }

  test("funnel reconciles and matches the keeper corpus") {
    val f = DedupPipeline.funnel(assign)
    assert(f.raw === docs.count())
    assert(f.raw === f.keepers + f.removed)
    assert(f.keepers > 0 && f.removed > 0) // fixture has real duplicates
    assert(DedupPipeline.keeperCorpus(docs, assign).count() === f.keepers)
  }

  test("exact duplicates collapse: keeper corpus has unique content keys") {
    val kept = DedupPipeline.keeperCorpus(docs, assign)
      .select(Text.normalizedKey(col("text")).as("k"))
    assert(kept.count() === kept.distinct().count())
  }

  test("Config.maxBandGroup reaches the pairing step (cap 0 disables every near-dup edge)") {
    import org.apache.spark.sql.expressions.Window
    // with every band over cap 0 dropped, NO near-dup edges form and the
    // clusters must be exactly the norm_key groups — observable only if
    // the Config cap actually flows into NearDup.confirmedPairs
    val assign0 = DedupPipeline.assignments(
      docs, DedupPipeline.Config(maxBandGroup = Some(0)))
    val expected = docs
      .select(col("doc_id"), Text.normalizedKey(col("text")).as("k"))
      .withColumn("keeper", when(col("k").isNull, col("doc_id"))
        .otherwise(min("doc_id").over(Window.partitionBy("k"))))
      .select("doc_id", "keeper")
    assert(assign0.select("doc_id", "keeper")
      .exceptAll(expected).count() === 0)
    assert(expected.exceptAll(assign0.select("doc_id", "keeper")).count() === 0)
    // and the default (uncapped) run has strictly fewer clusters: the
    // near-dup edges it adds merge some of these groups
    assert(assign0.filter(col("is_keeper")).count() >=
      assign.filter(col("is_keeper")).count())
  }

  test("representatives: one min-id doc per token-identical class, near-dup-invariant") {
    val reps = DedupPipeline.representatives(docs).persist()
    val classes = docs.select(md5(lower(trim(col("text")))).as("k")).distinct().count()
    assert(reps.count() === classes)
    // each representative is the min doc_id of its class
    val byClass = docs.select(md5(lower(trim(col("text")))).as("k"), col("doc_id"))
      .groupBy("k").agg(min("doc_id").as("doc_id")).select("doc_id")
    assert(reps.select("doc_id").exceptAll(byClass).count() === 0)
    reps.unpersist()
  }

  test("near-dup edges between exact-dup GROUPS survive the representative collapse") {
    import spark.implicits._
    // two exact-duplicate groups (identical text within each) whose texts
    // are near-duplicates of EACH OTHER (7 of 8 shingles shared -> jaccard
    // ~0.75), plus one unrelated singleton. The representative path must
    // still merge both groups into one cluster: reps of each group carry
    // the groups' near-dup relation, star edges carry members to reps.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = base.replace("kappa", "lambda")
    val docs = Seq(
      (0L, base), (1L, base), (2L, base),         // group A (exact dups)
      (10L, near), (11L, near),                   // group B (exact dups)
      (50L, "one two three four five six seven")  // unrelated
    ).toDF("doc_id", "text")
    val assign = DedupPipeline.assignments(docs)
    val keepers = assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // A and B merged: every member of both groups keeps min id 0
    Seq(0L, 1L, 2L, 10L, 11L).foreach(id =>
      assert(keepers(id) === 0L, s"doc $id not merged into the near-dup cluster"))
    assert(keepers(50L) === 50L)
  }

  test("confirmed near-dup pairs always share a keeper, and no pair survives") {
    val conf = NearDup.confirmedPairs(docs)
    val ka = assign.select(col("doc_id").as("doc_a"), col("keeper").as("keep_a"),
      col("is_keeper").as("ik_a"))
    val kb = assign.select(col("doc_id").as("doc_b"), col("keeper").as("keep_b"),
      col("is_keeper").as("ik_b"))
    val joined = conf.join(ka, "doc_a").join(kb, "doc_b").persist()
    assert(joined.count() === conf.count())
    assert(joined.filter(col("keep_a") =!= col("keep_b")).count() === 0)
    // at most one side of any confirmed near-dup pair survives dedup
    assert(joined.filter(col("ik_a") && col("ik_b")).count() === 0)
    joined.unpersist()
  }
}
