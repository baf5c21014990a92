package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar library for the training-data pipeline extensions
  * (beyond-parity per SURVEY.md §7.5): tokenization, n-gram shingling,
  * quality heuristics, language-ID scoring, fingerprinting.
  *
  * Everything is built from codegen'd built-ins (split / transform /
  * filter / md5) — no UDFs, so these run inside whole-stage codegen at any
  * scale. Shingling uses higher-order functions (interpreted expressions,
  * still vectorized per row, zero shuffle).
  */
object Text {
  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), " ")

  /** Word n-gram shingles (space-joined) over an ALREADY-MATERIALIZED token
    * array column. Callers must project `tokens(text)` into a named column
    * first: higher-order functions are interpreted (no common-subexpression
    * elimination), so passing the split expression directly would re-split
    * the text on every element access — O(windows x n) splits per row.
    * Guard: < n tokens -> empty. */
  def shinglesOfTokens(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(
        sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ts, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Count of tokens drawn from a marker list (language-ID / stopword hits). */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*)))

  /** Exact-dedup normalization key: md5 of the sorted distinct token set —
    * word-order-insensitive content identity. Null-in-null-out: concat_ws
    * would silently turn a null token ARRAY into "" (making every null
    * document a dedup group keyed md5("")), where the oracle's
    * array_to_string(NULL) stays NULL. */
  def normalizedKey(text: Column): Column =
    when(text.isNotNull,
      md5(concat_ws(" ", array_sort(array_distinct(tokens(text))))))

  /** Document fingerprint: md5 of the raw text (byte identity). */
  def fingerprint(text: Column): Column = md5(text)

  /** Winnowing-style rolling fingerprint: the minimum md5 over all k-word
    * windows — stable under appends outside the minimizing window. Takes a
    * materialized token array (see [[shinglesOfTokens]]). */
  def winnowOfTokens(ts: Column, k: Int): Column =
    array_min(transform(shinglesOfTokens(ts, k), s => md5(s)))
}
