package graft.pipelines

import graft.functions.{Corpus, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The training-data preparation pipeline as ONE lazily-built DataFrame
  * job (beyond-parity twin of [[OpsToJde]]'s dispatch composition): raw
  * documents -> quality gate -> exact dedup -> deterministic split ->
  * sequence packing. Each stage is the oracle-checked operator from the
  * catalog (`s_clean_corpus`, `s_hash_split`, `s_pack_sequences`) wired
  * end-to-end, so a user runs the whole prep with one call and gets the
  * packed training manifest back.
  *
  * Scale shape: stages 1-2 are scan-side expressions + one content-key
  * window (hash shuffle on norm_key); split assignment is a pure hash
  * expression (no shuffle); packing windows per (split, source) — one
  * more key shuffle. Nothing global, nothing driver-side; every stage is
  * deterministic under retries (md5-threshold membership, not rand()).
  */
object CorpusPipeline {
  /** @param minTokens  quality gate: minimum whitespace tokens
    * @param minTtr     quality gate: minimum type-token ratio
    * @param ctxTokens  packing context-window size in tokens
    * @param seed       split-membership seed (change to re-deal splits) */
  case class Config(
      minTokens: Int = 15,
      minTtr: Double = 0.25,
      ctxTokens: Int = 256,
      seed: String = ":split-seed-42")

  /** Per-document manifest: the cleaned, split, packed corpus.
    * Columns: doc_id, source, split, n_tokens, bin (context-window index
    * within (split, source), by doc_id order). */
  def prepare(documents: DataFrame, cfg: Config = Config()): DataFrame = {
    val toks = Text.tokens(col("text"))
    val nTokens = size(toks)
    val ttr = size(array_distinct(toks)).cast("double") / nTokens
    val stats = documents.select(
      col("doc_id"), col("source"),
      nTokens.as("n_tokens"), ttr.as("ttr"),
      Text.normalizedKey(col("text")).as("norm_key"))

    // shared column definitions (graft.functions.Corpus) — the SAME
    // expressions the oracle-checked catalog queries use, so this
    // pipeline cannot drift from what the driver verifies
    val qual = Corpus.qualityGate(col("n_tokens"), col("ttr"), cfg.minTokens, cfg.minTtr)
    val keyWin = Window.partitionBy("norm_key")
    val kept = stats
      .withColumn("qual", qual)
      .withColumn("winner",
        col("qual") && col("doc_id") === min(when(col("qual"), col("doc_id"))).over(keyWin))
      .filter(col("winner"))

    val split = Corpus.splitLabel(Corpus.splitBucket(col("doc_id"), cfg.seed))

    val packWin = Window.partitionBy("split", "source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kept
      .withColumn("split", split)
      .withColumn("prefix_before", sum(col("n_tokens")).over(packWin) - col("n_tokens"))
      .select(
        col("doc_id"), col("source"), col("split"), col("n_tokens"),
        Corpus.packBin(col("prefix_before"), cfg.ctxTokens).as("bin"))
  }

  case class Funnel(raw: Long, kept: Long, train: Long, `val`: Long, test: Long)

  /** Audit counts for the run — the numbers a data-quality dashboard
    * tracks per corpus build. ONE rollup pass over the manifest yields the
    * per-split counts AND the kept total (grouping() flags the grand-total
    * row), plus one count on the raw side — two jobs, not four, and the
    * manifest plan executes exactly once. */
  def funnel(documents: DataFrame, manifest: DataFrame): Funnel = {
    val rolled = manifest.rollup("split")
      .agg(count(lit(1)).as("n"), grouping(col("split")).as("g"))
      .collect()
    val bySplit = rolled.filter(_.getByte(2) == 0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = rolled.find(_.getByte(2) == 1).map(_.getLong(1)).getOrElse(0L)
    Funnel(
      raw = documents.count(),
      kept = kept,
      train = bySplit.getOrElse("train", 0L),
      `val` = bySplit.getOrElse("val", 0L),
      test = bySplit.getOrElse("test", 0L))
  }
}
