package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The corpus-assembly column expressions shared by the oracle-checked
  * catalog queries (`s_hash_split`, `s_clean_corpus`, `s_pack_sequences`)
  * and the composed [[graft.pipelines.CorpusPipeline]] — ONE definition
  * each, so the pipeline can never drift from the operators the oracle
  * verifies. */
object Corpus {
  /** Deterministic split-membership bucket: 2 hex chars of a seeded md5
    * (256 uniform values, compared lexicographically — identical in any
    * engine; see SamplingQueries for the threshold arithmetic). */
  def splitBucket(docId: Column, seed: String): Column =
    substring(md5(concat(docId.cast("string"), lit(seed))), 1, 2)

  /** train/val/test assignment: test < '0d' (~5%), val < '27' (~10%). */
  def splitLabel(bucket: Column): Column =
    when(bucket < "0d", "test").when(bucket < "27", "val").otherwise("train")

  /** The quality gate used by the cleaning funnel. */
  def qualityGate(nTokens: Column, ttr: Column, minTokens: Int, minTtr: Double): Column =
    nTokens >= minTokens && ttr >= minTtr

  /** Concat-and-chunk context-window bin from the running token prefix. */
  def packBin(prefixBefore: Column, ctxTokens: Int): Column =
    floor(prefixBefore / ctxTokens.toDouble)
}
