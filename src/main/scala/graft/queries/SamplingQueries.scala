package graft.queries

import graft.ops.Lineage._
import graft.functions.Text
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data sampling / mixing / packing operators over `documents` —
  * the corpus-assembly surface of an LLM data pipeline (beyond-parity,
  * BASELINE.json north star). All sampling is DETERMINISTIC: membership is
  * a pure function of (stable id, seed string) via md5, so a re-run on a
  * 1000-executor cluster reproduces the same split/sample bit-for-bit —
  * `rand()` would not survive retries or repartitioning.
  *
  * The hex-prefix trick: `substr(md5(id || seed), 1, 2) < threshold`
  * compares lexicographically in BOTH engines over the same 256-value
  * alphabet, so a threshold of '80' is exactly 128/256 = 50%, '40' is 25%,
  * '1a' is 26/256 ≈ 10%. No hex→int conversion needed (DuckDB 1.0 has
  * none) and no floating-point sampling boundary.
  */
object SamplingQueries {
  import graft.functions.Corpus

  /** Mixture weight per source: srcN keeps 100/50/25/~10 % by N mod 4 —
    * the up/down-weighting a corpus mix applies per provenance. */
  private val mixThresholds = Map(0 -> "zz", 1 -> "80", 2 -> "40", 3 -> "1a")

  val qs: Seq[Q] = Seq(
    Q(
      "s_hash_split",
      """Deterministic train/val/test split: bucket = md5(doc_id, seed)
        |prefix, test < '0d' (~5%), val < '27' (~10%), rest train —
        |stratification audited per (source, split). Pure scan-side
        |expression + one hash aggregate; membership is reproducible on
        |any cluster topology, unlike rand()-based splits.""".stripMargin,
      Some(
        """SELECT source,
          |       CASE WHEN substr(md5(doc_id::VARCHAR || ':split-seed-42'), 1, 2) < '0d' THEN 'test'
          |            WHEN substr(md5(doc_id::VARCHAR || ':split-seed-42'), 1, 2) < '27' THEN 'val'
          |            ELSE 'train' END AS split,
          |       COUNT(*) AS n_docs,
          |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
          |FROM documents
          |GROUP BY 1, 2
          |ORDER BY source, split""".stripMargin),
      (s, dir) => {
        val b = Corpus.splitBucket(col("doc_id"), ":split-seed-42")
        Tables.documents(s, dir)
          .groupBy(
            col("source"),
            Corpus.splitLabel(b).as("split"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy("source", "split")
      }),

    Q(
      "s_weighted_mix",
      """Weighted corpus mixture: each source carries a sampling rate from
        |a small weights dim (100/50/25/~10% by source number mod 4);
        |membership is the deterministic hash-prefix test against the
        |rate's hex threshold. The weights table is broadcast — the mix
        |never shuffles the corpus, only annotates the scan. Reports
        |kept/total per source so the realized rate is auditable.""".stripMargin,
      Some(
        """SELECT source,
          |       COUNT(*) AS n_total,
          |       COUNT(CASE WHEN substr(md5(source || ':' || doc_id::VARCHAR || ':mix-seed-7'), 1, 2)
          |                       < (CASE CAST(regexp_extract(source, '[0-9]+') AS INT) % 4
          |                          WHEN 0 THEN 'zz' WHEN 1 THEN '80'
          |                          WHEN 2 THEN '40' ELSE '1a' END)
          |                  THEN 1 END) AS n_kept,
          |       CAST(COUNT(CASE WHEN substr(md5(source || ':' || doc_id::VARCHAR || ':mix-seed-7'), 1, 2)
          |                       < (CASE CAST(regexp_extract(source, '[0-9]+') AS INT) % 4
          |                          WHEN 0 THEN 'zz' WHEN 1 THEN '80'
          |                          WHEN 2 THEN '40' ELSE '1a' END)
          |                  THEN 1 END) AS DOUBLE) / COUNT(*) AS realized_rate
          |FROM documents
          |GROUP BY source
          |ORDER BY source""".stripMargin),
      (s, dir) => {
        // the weights dim is DATA-DRIVEN (distinct sources + the mod-4
        // rate rule), not a hardcoded src0..src19 literal: round 9's
        // 5x scale-verify caught the literal dim dropping every row of
        // the key-shifted replica (sources are suffixed there) — the
        // exact silent-inner-join-miss failure a production mix table
        // must survive. Still broadcast, still source-cardinality-sized.
        val weights = broadcast(
          Tables.documents(s, dir).select("source").distinct()
            .withColumn("thr", element_at(typedLit(mixThresholds),
              expr("cast(regexp_extract(source, '[0-9]+', 0) as int) % 4"))))
        val b = substring(
          md5(concat(col("source"), lit(":"), col("doc_id").cast("string"), lit(":mix-seed-7"))),
          1, 2)
        Tables.documents(s, dir)
          .join(weights, Seq("source"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_total"),
            count(when(b < col("thr"), true)).as("n_kept"),
            (count(when(b < col("thr"), true)).cast("double") / count(lit(1)))
              .as("realized_rate"))
          .orderBy("source")
      }),

    Q(
      "s_temperature_mix",
      """Temperature-flattened domain mixing (the multilingual-LM sampling
        |rule, p_s ∝ n_s^α with α = 0.5): per-source token masses are
        |flattened so rare domains are upweighted, a 25%-of-corpus token
        |budget is apportioned by the flattened distribution, and each
        |source's sampling rate is realized as the same deterministic
        |md5-prefix membership test s_weighted_mix uses (threshold =
        |rate·16⁸ as an 8-hex-char cut).
        |
        |Determinism across engines: sqrt masses round to 6 dp and sum as
        |DECIMAL(27,6) (exact — no float summation-order drift in the
        |normalizer), every derived ratio rounds to 6 dp, and the global
        |sums are windows over the POST-AGGREGATED source frame (source-
        |cardinality-sized, like t_vocab_topk's vocab window). The corpus
        |itself is scanned twice (once for masses, once for membership)
        |and never shuffles — rates ride a broadcast join.""".stripMargin,
      Some(
        """WITH toks AS (
          |  SELECT source, doc_id,
          |         len(string_split(lower(trim(text)), ' ')) AS n
          |  FROM documents WHERE text IS NOT NULL),
          |per AS (
          |  SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens
          |  FROM toks GROUP BY source),
          |norm AS (
          |  SELECT source, n_tokens,
          |         CAST(SUM(CAST(round(sqrt(n_tokens), 6) AS DECIMAL(27,6)))
          |              OVER () AS DOUBLE) AS xs,
          |         CAST(SUM(n_tokens) OVER () AS BIGINT) AS tot
          |  FROM per),
          |rates AS (
          |  SELECT source, n_tokens,
          |         round(CAST(n_tokens AS DOUBLE) / tot, 6) AS p_raw,
          |         round(round(sqrt(n_tokens), 6) / xs, 6) AS p_temp,
          |         round(LEAST(1.0, round(round(sqrt(n_tokens), 6) / xs, 6)
          |                          * 0.25 * tot / n_tokens), 6) AS rate
          |  FROM norm),
          |thr AS (
          |  SELECT *, CASE WHEN rate >= 1.0 THEN 'zzzzzzzz'
          |                 ELSE printf('%08x', CAST(FLOOR(rate * 4294967296) AS BIGINT))
          |            END AS t
          |  FROM rates)
          |SELECT th.source, th.n_tokens, th.p_raw, th.p_temp, th.rate,
          |       COUNT(*) AS n_total,
          |       COUNT(CASE WHEN substr(md5(d.source || ':' || d.doc_id::VARCHAR
          |                                  || ':temp-seed-3'), 1, 8) < th.t
          |                  THEN 1 END) AS n_kept
          |FROM documents d JOIN thr th ON d.source = th.source
          |WHERE d.text IS NOT NULL
          |GROUP BY th.source, th.n_tokens, th.p_raw, th.p_temp, th.rate
          |ORDER BY th.source""".stripMargin),
      (s, dir) => {
        val wAll = Window.partitionBy()
        val per = Tables.documents(s, dir)
          .filter(col("text").isNotNull)
          .groupBy("source")
          .agg(sum(size(Text.tokens(col("text")))).as("n_tokens"))
        val x = round(sqrt(col("n_tokens").cast("double")), 6)
        val rates = per
          .withColumn("xs", sum(x.cast("decimal(27,6)")).over(wAll).cast("double"))
          .withColumn("tot", sum(col("n_tokens")).over(wAll))
          .withColumn("p_raw", round(col("n_tokens").cast("double") / col("tot"), 6))
          .withColumn("p_temp", round(x / col("xs"), 6))
          .withColumn("rate", round(least(lit(1.0),
            col("p_temp") * lit(0.25) * col("tot") / col("n_tokens")), 6))
          .withColumn("t", when(col("rate") >= 1.0, lit("zzzzzzzz"))
            .otherwise(lower(lpad(
              hex(floor(col("rate") * lit(4294967296L)).cast("long")), 8, "0"))))
          .select("source", "n_tokens", "p_raw", "p_temp", "rate", "t")
        val member = substring(
          md5(concat(col("source"), lit(":"), col("doc_id").cast("string"),
            lit(":temp-seed-3"))), 1, 8) < col("t")
        Tables.documents(s, dir)
          .filter(col("text").isNotNull)
          .join(broadcast(rates), Seq("source"))
          .groupBy("source", "n_tokens", "p_raw", "p_temp", "rate")
          .agg(
            count(lit(1)).as("n_total"),
            count(when(member, true)).as("n_kept"))
          .orderBy("source")
      }),

    Q(
      "s_pack_sequences",
      """Sequence packing (concat-and-chunk): documents are laid out in
        |(source, doc_id) order, token prefix sums assign each document a
        |context-window bin of 256 tokens — the packing step that turns a
        |cleaned corpus into fixed-length training sequences. The running
        |sum is a window PARTITIONED BY source (each source packs
        |independently), so the plan is one shuffle on source + linear
        |window scan — no global sort at any scale; at 100 TB sources
        |shard further by hash-range without changing bin identity.""".stripMargin,
      Some(
        """WITH toks AS (
          |  SELECT source, doc_id,
          |         len(string_split(lower(trim(text)), ' ')) AS n_tokens
          |  FROM documents WHERE text IS NOT NULL),
          |packed AS (
          |  SELECT source, n_tokens,
          |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           - n_tokens AS prefix_before
          |  FROM toks)
          |SELECT source,
          |       CAST(FLOOR(prefix_before / 256.0) AS BIGINT) AS bin,
          |       COUNT(*) AS n_docs,
          |       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
          |       CAST(SUM(n_tokens) AS DOUBLE) / 256 AS fill_ratio
          |FROM packed
          |GROUP BY source, bin
          |ORDER BY source, bin""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, dir)
          // a null text would inject n_tokens = -1 (legacy sizeOfNull,
          // kept for perf — see GraftSession) and shift every later bin
          .filter(col("text").isNotNull)
          .select(col("source"), col("doc_id"),
            size(Text.tokens(col("text"))).as("n_tokens"))
          .withColumn("prefix_before",
            sum(col("n_tokens")).over(w) - col("n_tokens"))
          .groupBy(col("source"),
            Corpus.packBin(col("prefix_before"), 256).as("bin"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("bin_tokens"),
            (sum(col("n_tokens")).cast("double") / 256).as("fill_ratio"))
          .orderBy("source", "bin")
      }),

    Q(
      "s_sample_per_group",
      """Deterministic exactly-k per-group sampling (balanced subset per
        |source — the class-balancing step of corpus assembly): rank docs
        |by a Knuth multiplicative hash of doc_id and keep the top 5 per
        |source. Runs through the native bounded top-k AGGREGATE
        |(graft_topk), so each map task holds at most k docs per source
        |and the shuffle carries answers — a reservoir-sample shape with
        |none of the reservoir's order sensitivity: membership is a pure
        |function of doc_id, reproducible under retries and
        |repartitioning. Oracle ranks the same hash with a window.""".stripMargin,
      Some(
        """WITH scored AS (
          |  SELECT source, doc_id,
          |         CAST((doc_id * 2654435761) % 2147483647 AS DOUBLE) AS score
          |  FROM documents)
          |SELECT source, doc_id, rn FROM (
          |  SELECT source, doc_id,
          |         ROW_NUMBER() OVER (PARTITION BY source
          |                            ORDER BY score DESC, doc_id) AS rn
          |  FROM scored)
          |WHERE rn <= 5
          |ORDER BY source, rn""".stripMargin),
      (s, dir) => {
        val score = ((col("doc_id") * 2654435761L) % 2147483647L).cast("double")
        Tables.documents(s, dir)
          .select(col("source"), col("doc_id"), score.as("score"))
          .groupBy("source")
          .agg(graft.functions.Vectors.topKByScore(col("score"), col("doc_id"), 5).as("top"))
          .select(col("source"), posexplode(col("top")))
          .select(col("source"), col("col.id").as("doc_id"),
            (col("pos") + 1).cast("int").as("rn"))
          .orderBy("source", "rn")
      }),

    Q(
      "s_clean_corpus",
      """The end-to-end corpus-cleaning pipeline as ONE composed query:
        |quality gate (>= 15 tokens, type-token ratio >= 0.25) then exact
        |dedup over the normalized token-set key keeping the lowest doc_id
        |per group, reported per source as a funnel (raw -> quality ->
        |kept) with surviving token mass. The dedup winner is a windowed
        |min over the normalized key — hash-partitioned by content key, so
        |the whole pipeline is scan + one key shuffle + one source
        |aggregate at any scale.""".stripMargin,
      Some(
        """WITH stats AS (
          |  SELECT doc_id, source,
          |         len(string_split(lower(trim(text)), ' ')) AS n_tokens,
          |         CAST(len(list_distinct(string_split(lower(trim(text)), ' '))) AS DOUBLE)
          |           / len(string_split(lower(trim(text)), ' ')) AS ttr,
          |         md5(array_to_string(list_sort(list_distinct(
          |           string_split(lower(trim(text)), ' '))), ' ')) AS norm_key
          |  FROM documents),
          |flagged AS (
          |  SELECT source, n_tokens,
          |         (n_tokens >= 15 AND ttr >= 0.25) AS qual,
          |         (n_tokens >= 15 AND ttr >= 0.25)
          |           AND doc_id = MIN(CASE WHEN n_tokens >= 15 AND ttr >= 0.25
          |                                 THEN doc_id END)
          |                        OVER (PARTITION BY norm_key) AS winner
          |  FROM stats)
          |SELECT source,
          |       COUNT(*) AS n_raw,
          |       COUNT(CASE WHEN qual THEN 1 END) AS n_quality,
          |       COUNT(CASE WHEN winner THEN 1 END) AS n_kept,
          |       CAST(SUM(CASE WHEN winner THEN n_tokens END) AS BIGINT) AS kept_tokens
          |FROM flagged
          |GROUP BY source
          |ORDER BY source""".stripMargin),
      (s, dir) => {
        val toks = Text.tokens(col("text"))
        val nTokens = size(toks)
        val ttr = size(array_distinct(toks)).cast("double") / nTokens
        val stats = Tables.documents(s, dir).select(
          col("doc_id"), col("source"),
          nTokens.as("n_tokens"),
          ttr.as("ttr"),
          Text.normalizedKey(col("text")).as("norm_key"))
        val qual = Corpus.qualityGate(col("n_tokens"), col("ttr"), 15, 0.25)
        val keyWin = Window.partitionBy("norm_key")
        stats
          .withColumn("qual", qual)
          .withColumn("winner",
            col("qual") && col("doc_id") === min(when(col("qual"), col("doc_id"))).over(keyWin))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_raw"),
            count(when(col("qual"), true)).as("n_quality"),
            count(when(col("winner"), true)).as("n_kept"),
            sum(when(col("winner"), col("n_tokens"))).as("kept_tokens"))
          .orderBy("source")
      }),

    Q(
      "s_chunk_overlap",
      """Sliding-window chunking with overlap: long documents cut into
        |40-token windows at stride 30 (10-token overlap), the standard
        |long-document preparation before packing/embedding. Chunk starts
        |are a row-local `sequence`, the windows a row-local `slice` —
        |the only row growth is the ~n/stride generator fan-out at the
        |scan (like the action flattener), no shuffle until the output
        |sort. Chunks are reported by md5 so the output stays key-sized
        |at any document length.""".stripMargin,
      Some(
        """WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
          |           FROM documents),
          |c AS (
          |  SELECT doc_id,
          |         unnest(list_transform(range(len(range(0, len(toks), 30))),
          |           i -> {chunk_id: i,
          |                 start_tok: i*30,
          |                 chunk: toks[i*30+1 : i*30+40]})) AS u
          |  FROM t)
          |SELECT doc_id, u.chunk_id AS chunk_id, u.start_tok AS start_tok,
          |       len(u.chunk) AS n_chunk_toks,
          |       md5(array_to_string(u.chunk, ' ')) AS chunk_md5
          |FROM c
          |ORDER BY doc_id, chunk_id""".stripMargin),
      (s, dir) => {
        val stride = 30
        val width = 40
        Tables.documents(s, dir)
          // null text would make the sequence bound null; DuckDB's
          // unnest-of-null emits nothing for such docs, so drop them
          // explicitly to keep the engines row-identical
          .filter(col("text").isNotNull)
          .withColumn("toks", Text.tokens(col("text")))
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(0), size(col("toks")) - 1, lit(stride)),
              st => slice(col("toks"), st + 1, lit(width)))))
          .select(
            col("doc_id"),
            col("pos").as("chunk_id"),
            (col("pos") * stride).as("start_tok"),
            size(col("col")).as("n_chunk_toks"),
            md5(concat_ws(" ", col("col"))).as("chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      }),

    Q(
      "s_epoch_shuffle",
      """Deterministic epoch shuffle — the dataloader contract: every
        |document gets a shard (hash-derived, so shard membership is
        |stable under retries/repartitioning) and a within-shard position
        |that reshuffles per epoch (order key = md5(doc_id, epoch seed)).
        |A 256-worker training job reads shard w in position order and
        |every re-run feeds batches in the identical sequence — rand()
        |or zipWithIndex would survive neither retries nor topology
        |changes. Shard int derivation (graft.functions.Sharding): two
        |md5 hex nibbles located via instr('0123456789abcdef', c) —
        |identical byte semantics in Spark and DuckDB (neither has a
        |portable hex->int builtin), uniform across all 256 shards, and
        |extensible a nibble (16x) at a time for larger fleets. The rank
        |window partitions by shard: parallelism = nShards at any corpus
        |size, never a global sort.""".stripMargin,
      Some(
        """WITH s AS (
          |  SELECT doc_id,
          |         CAST(((instr('0123456789abcdef',
          |                      substr(md5(doc_id::VARCHAR || ':shard-seed-42'), 1, 1)) - 1) * 16
          |               + instr('0123456789abcdef',
          |                       substr(md5(doc_id::VARCHAR || ':shard-seed-42'), 2, 1)) - 1) % 256
          |              AS INT) AS shard
          |  FROM documents)
          |SELECT doc_id, shard,
          |       CAST(row_number() OVER (
          |         PARTITION BY shard
          |         ORDER BY md5(doc_id::VARCHAR || ':epoch-1'), doc_id) AS BIGINT) AS pos
          |FROM s
          |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val orderKey = md5(concat(col("doc_id").cast("string"), lit(":epoch-1")))
        Tables.documents(s, dir)
          .withColumn("shard",
            graft.functions.Sharding.shardOf(col("doc_id"), ":shard-seed-42", 256))
          .select(
            col("doc_id"), col("shard"),
            row_number().over(
              Window.partitionBy("shard").orderBy(orderKey, col("doc_id")))
              .cast("long").as("pos"))
          .orderBy("doc_id")
      }),

    Q(
      "s_token_budget",
      """Token-budget data selection: keep the highest-quality documents
        |until 30% of the corpus's tokens are spent (quality = type-token
        |ratio bucketed to 1/1000ths; ties break on doc_id). The naive
        |form is a GLOBAL ordered running sum — a single-partition window
        |that serializes the corpus through one task. This implements the
        |scale-correct histogram-cutoff instead: per-bucket token sums
        |(<= 1001 rows) take the tiny global window; buckets fully inside /
        |outside the budget decide row-locally off the broadcast cutoff
        |table; ONLY the one straddling bucket runs a within-bucket
        |running sum. The budget is pure integer arithmetic
        |((3 * total) DIV 10) — a 0.3 * sum double would floor differently
        |than the oracle's decimal on exact multiples. Oracle = the global
        |running-sum definition, proving the decomposition selects the
        |identical document set.""".stripMargin,
      Some(
        """WITH d AS (
          |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
          |  FROM documents WHERE text IS NOT NULL),
          |b AS (
          |  SELECT doc_id, len(ws) AS n_tokens,
          |         CAST(floor(CAST(len(list_distinct(ws)) AS DOUBLE)
          |                    / len(ws) * 1000) AS INT) AS bucket
          |  FROM d),
          |t AS (SELECT (3 * SUM(n_tokens)) // 10 AS budget FROM b),
          |o AS (
          |  SELECT doc_id, n_tokens, bucket,
          |         COALESCE(SUM(n_tokens) OVER (ORDER BY bucket DESC, doc_id
          |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          |  FROM b)
          |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, bucket,
          |       (cb < budget) AS selected
          |FROM o, t
          |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .filter(col("text").isNotNull)
          .withColumn("ws", Text.tokens(col("text")))
          .select(
            col("doc_id"),
            size(col("ws")).cast("long").as("n_tokens"),
            floor(size(array_distinct(col("ws"))).cast("double")
              / size(col("ws")) * 1000).cast("int").as("bucket"))
        // the tiny frame: per-bucket token totals + the budget + each
        // bucket's tokens-before — all computed over <= 1001 rows, then
        // broadcast back to the corpus
        val wDesc = Window.orderBy(col("bucket").desc)
        val cuts = base.groupBy("bucket").agg(sum("n_tokens").as("bt"))
          .withColumn("cum_before", coalesce(
            sum("bt").over(wDesc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("total",
            sum("bt").over(wDesc.rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("budget", expr("(3 * total) DIV 10"))
          .select("bucket", "bt", "cum_before", "budget")
          // materialize the <=1001-row cutoff table ONCE: both union
          // branches below reference it, and without this each branch
          // re-runs the bucket agg (two extra corpus scans)
          .cutLineage(true)
        val joined = base.join(broadcast(cuts), "bucket")
        val straddles =
          col("cum_before") < col("budget") && col("cum_before") + col("bt") > col("budget")
        // decided buckets: membership is row-local off the broadcast
        val decided = joined.filter(!straddles)
          .withColumn("selected", col("cum_before") + col("bt") <= col("budget"))
        // the one straddling bucket: within-bucket running sum, ordered by
        // doc_id — bucket-sized work, not corpus-sized
        val wIn = Window.partitionBy("bucket").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val straddled = joined.filter(straddles)
          .withColumn("selected",
            col("cum_before") + coalesce(sum("n_tokens").over(wIn), lit(0L)) < col("budget"))
        decided.unionByName(straddled)
          .select("doc_id", "n_tokens", "bucket", "selected")
          .orderBy("doc_id")
      }),

    Q(
      "s_stratified_split",
      """Stratified train/val/test split with EXACT per-stratum proportions
        |— what an eval-set assembly needs where the hash split
        |(s_hash_split) only hits its fractions in expectation: within each
        |source, docs order by id and the first floor(80%) are train, the
        |next floor(90%)-floor(80%) are val, the rest test. One shuffle on
        |the stratum key serves the rank window and the count; the output
        |aggregates to (source, bucket) counts with id-range endpoints so
        |the oracle hash proves the exact assignment boundaries, not just
        |the sizes.""".stripMargin,
      Some(
        """WITH ranked AS (
          |  SELECT doc_id, source,
          |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
          |         COUNT(*) OVER (PARTITION BY source) AS n
          |  FROM documents),
          |tagged AS (
          |  SELECT doc_id, source,
          |         CASE WHEN rn <= (n * 8) // 10 THEN 'train'
          |              WHEN rn <= (n * 9) // 10 THEN 'val'
          |              ELSE 'test' END AS bucket
          |  FROM ranked)
          |SELECT source, bucket, COUNT(*) AS n_docs,
          |       MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
          |FROM tagged GROUP BY source, bucket
          |ORDER BY source, bucket""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
        val tagged = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
          .withColumn("bucket",
            when(col("rn") <= expr("(n * 8) div 10"), lit("train"))
              .when(col("rn") <= expr("(n * 9) div 10"), lit("val"))
              .otherwise(lit("test")))
        tagged.groupBy("source", "bucket")
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
          .orderBy("source", "bucket")
      }),

    Q(
      "corpus_pipeline_full",
      """The FULL corpus-preparation composition as one oracle row:
        |quality gate -> exact-dedup winner -> deterministic train/val/
        |test split -> per-(split, source) sequence packing — the
        |clean-to-training-batches path CorpusPipeline implements as
        |code, proven end to end the way corpus_pipeline_keepers proves
        |the crawl-curation path. Every stage IS the already-verified
        |operator (s_clean_corpus's gate+winner, s_hash_split's seeded
        |membership, s_pack_sequences's running-sum bins) via the shared
        |Corpus/Text column definitions, so the composition cannot drift
        |from the operators. Shape: one content-key window (dedup), then
        |one (split, source) window (packing) — two key partitionings
        |plus the output sort, nothing global.""".stripMargin,
      Some(
        """WITH stats AS (
          |  SELECT doc_id, source,
          |         len(string_split(lower(trim(text)), ' ')) AS n_tokens,
          |         CAST(len(list_distinct(string_split(lower(trim(text)), ' '))) AS DOUBLE)
          |           / len(string_split(lower(trim(text)), ' ')) AS ttr,
          |         md5(array_to_string(list_sort(list_distinct(
          |           string_split(lower(trim(text)), ' '))), ' ')) AS norm_key
          |  FROM documents),
          |keep AS (
          |  SELECT doc_id, source, n_tokens,
          |         (n_tokens >= 15 AND ttr >= 0.25)
          |           AND doc_id = MIN(CASE WHEN n_tokens >= 15 AND ttr >= 0.25
          |                                 THEN doc_id END)
          |                        OVER (PARTITION BY norm_key) AS winner
          |  FROM stats),
          |sp AS (
          |  SELECT doc_id, source, n_tokens,
          |         CASE WHEN substr(md5(doc_id::VARCHAR || ':split-seed-42'), 1, 2) < '0d' THEN 'test'
          |              WHEN substr(md5(doc_id::VARCHAR || ':split-seed-42'), 1, 2) < '27' THEN 'val'
          |              ELSE 'train' END AS split
          |  FROM keep WHERE winner),
          |packed AS (
          |  SELECT split, source, n_tokens,
          |         SUM(n_tokens) OVER (PARTITION BY split, source ORDER BY doc_id
          |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           - n_tokens AS prefix_before
          |  FROM sp)
          |SELECT split, source,
          |       CAST(FLOOR(prefix_before / 256.0) AS BIGINT) AS bin,
          |       CAST(COUNT(*) AS BIGINT) AS n_docs,
          |       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
          |FROM packed GROUP BY 1, 2, 3
          |ORDER BY split, source, bin""".stripMargin),
      (s, dir) => {
        val toks = Text.tokens(col("text"))
        val nTokens = size(toks)
        val ttr = size(array_distinct(toks)).cast("double") / nTokens
        val stats = Tables.documents(s, dir).select(
          col("doc_id"), col("source"),
          nTokens.as("n_tokens"), ttr.as("ttr"),
          Text.normalizedKey(col("text")).as("norm_key"))
        val qual = Corpus.qualityGate(col("n_tokens"), col("ttr"), 15, 0.25)
        val keyWin = Window.partitionBy("norm_key")
        val kept = stats
          .withColumn("winner",
            qual && col("doc_id") ===
              min(when(qual, col("doc_id"))).over(keyWin))
          .filter(col("winner"))
          .withColumn("split",
            Corpus.splitLabel(Corpus.splitBucket(col("doc_id"), ":split-seed-42")))
        val packWin = Window.partitionBy("split", "source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        kept
          .withColumn("prefix_before",
            sum(col("n_tokens")).over(packWin) - col("n_tokens"))
          .groupBy(col("split"), col("source"),
            Corpus.packBin(col("prefix_before"), 256).as("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("bin_tokens"))
          .orderBy("split", "source", "bin")
      }),

    Q(
      "corpus_pipeline_incremental",
      """The ARRIVAL increment of the corpus build, proven equal to the
        |from-scratch rebuild by the oracle itself: the Spark side runs
        |the incremental composition — historical manifest (quality gate
        |+ per-key exact-dedup winner over the epoch-0 corpus), key index
        |of kept keys, then the new batch (epoch 1, the doc_id % 5 == 0
        |slice) gated, anti-joined against the index (dup_history drop),
        |within-batch winner picked, and APPENDED — while the DuckDB side
        |rebuilds the manifest from scratch on the union with the
        |first-arrived-wins rule (winner per key = min (epoch, doc_id)
        |among gate-passers). A hash match IS the exactly-once proof: the
        |append path and the rebuild path produce the identical manifest,
        |the streaming analog of the reference's dispatch loop
        |(dags/dag_bakery_system_to_jde.py:309-320, where the
        |unique_transaction_id state table makes re-delivery idempotent).
        |Scale shape: the history side shuffles once on norm_key (window
        |+ index are the same partitioning), the index is kept-key-sized,
        |and only the small arriving batch moves through the anti-join —
        |at cluster scale the index lives bucketed by key and the
        |increment never rescans the corpus.""".stripMargin,
      Some(
        """WITH stats AS (
          |  SELECT doc_id, source,
          |         len(string_split(lower(trim(text)), ' ')) AS n_tokens,
          |         CAST(len(list_distinct(string_split(lower(trim(text)), ' '))) AS DOUBLE)
          |           / len(string_split(lower(trim(text)), ' ')) AS ttr,
          |         md5(array_to_string(list_sort(list_distinct(
          |           string_split(lower(trim(text)), ' '))), ' ')) AS norm_key,
          |         CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS epoch
          |  FROM documents),
          |q AS (SELECT * FROM stats WHERE n_tokens >= 15 AND ttr >= 0.25),
          |w AS (
          |  SELECT doc_id, norm_key, source, n_tokens, epoch,
          |         MIN(epoch) OVER (PARTITION BY norm_key) AS min_epoch
          |  FROM q),
          |w2 AS (
          |  SELECT *, MIN(CASE WHEN epoch = min_epoch THEN doc_id END)
          |              OVER (PARTITION BY norm_key) AS win_id
          |  FROM w)
          |SELECT doc_id, norm_key, source, n_tokens, epoch
          |FROM w2 WHERE epoch = min_epoch AND doc_id = win_id
          |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val toks = Text.tokens(col("text"))
        val nTokens = size(toks)
        val ttr = size(array_distinct(toks)).cast("double") / nTokens
        val stats = Tables.documents(s, dir).select(
            col("doc_id"), col("source"),
            nTokens.as("n_tokens"), ttr.as("ttr"),
            Text.normalizedKey(col("text")).as("norm_key"))
          .withColumn("qual",
            Corpus.qualityGate(col("n_tokens"), col("ttr"), 15, 0.25))
        val keyWin = Window.partitionBy("norm_key")
        // epoch 0: the persisted state — manifest + key index
        val histManifest = stats.filter(col("doc_id") % 5 =!= 0)
          .withColumn("winner", col("qual") &&
            col("doc_id") === min(when(col("qual"), col("doc_id"))).over(keyWin))
          .filter(col("winner"))
          .select(col("doc_id"), col("norm_key"), col("source"),
            col("n_tokens"), lit(0L).as("epoch"))
          // consumed twice (manifest branch + key index): materialize once
          // instead of re-scanning the corpus per branch — in production
          // this frame IS the persisted state table, so one derivation is
          // also the honest cost model
          .cutLineage()
        val keyIndex = histManifest.select("norm_key").distinct()
        // epoch 1: the arriving batch — gate, drop dup_history via the
        // index, keep the within-batch first per key, append
        val increment = stats.filter(col("doc_id") % 5 === 0)
          .filter(col("qual"))
          .join(keyIndex, Seq("norm_key"), "left_anti")
          .withColumn("first_id", min("doc_id").over(keyWin))
          .filter(col("doc_id") === col("first_id"))
          .select(col("doc_id"), col("norm_key"), col("source"),
            col("n_tokens"), lit(1L).as("epoch"))
        histManifest.unionByName(increment).orderBy("doc_id")
      }),

    Q(
      "s_jackknife_blocks",
      """Block-jackknife variance estimation — the error bar a corpus
        |statistic needs before anyone trusts it (delete-one-block
        |resampling, the method survey statistics and LM eval suites use
        |at scale because it needs only per-block sums): the mean
        |purchase value is re-estimated leaving out each of 10
        |hash-assigned blocks, and the jackknife variance
        |(g-1)/g * sum((loo_i - mean_loo)^2) comes out in exact integer
        |micro^2 via the g-scaled square trick (multiply through by g so
        |no fractional mean is ever formed; means are scale-stable, so
        |the squares stay far inside int64 at any replica). Blocks are
        |md5-nibble-assigned (16 nibbles folded on 10 blocks — jackknife
        |does not require equal blocks). Shape: ONE block aggregate (10
        |rows) from one scan; every window after runs on the 10-row
        |frame.""".stripMargin,
      Some(
        """WITH p AS (
          |  SELECT CAST(floor(value * 1000000) AS BIGINT) AS vm,
          |         strpos('0123456789abcdef',
          |                substr(md5(CAST(event_id AS VARCHAR) || ':jk'), 1, 1)) % 10
          |           AS blk
          |  FROM events WHERE event_type = 'purchase'),
          |b AS (
          |  SELECT blk, CAST(COUNT(*) AS BIGINT) AS n_b, CAST(SUM(vm) AS BIGINT) AS s_b
          |  FROM p GROUP BY blk),
          |t AS (
          |  SELECT blk, n_b, s_b,
          |         CAST(SUM(n_b) OVER () AS BIGINT) AS n,
          |         CAST(SUM(s_b) OVER () AS BIGINT) AS s
          |  FROM b),
          |loo AS (
          |  SELECT blk, n_b, s_b, n, s, (s - s_b) // (n - n_b) AS loo_mean FROM t),
          |v AS (
          |  SELECT blk, n_b, s_b, loo_mean, s // n AS grand_mean,
          |         CAST(SUM(loo_mean) OVER () AS BIGINT) AS sl
          |  FROM loo)
          |SELECT blk, n_b, s_b, loo_mean, grand_mean,
          |       9 * CAST(SUM((10 * loo_mean - sl) * (10 * loo_mean - sl)) OVER ()
          |                AS BIGINT) // 1000 AS jk_var_milli
          |FROM v ORDER BY blk""".stripMargin),
      (s, dir) => {
        val frame = Window.partitionBy().orderBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(floor(col("value") * 1000000L).cast("long").as("vm"),
            (expr("instr('0123456789abcdef', substring(md5(concat(cast(event_id as string), ':jk')), 1, 1))") % 10)
              .as("blk"))
          .groupBy("blk")
          .agg(count(lit(1)).as("n_b"), sum(col("vm")).as("s_b"))
          .withColumn("n", sum(col("n_b")).over(frame))
          .withColumn("s", sum(col("s_b")).over(frame))
          .withColumn("loo_mean", expr("(s - s_b) div (n - n_b)"))
          .withColumn("grand_mean", expr("s div n"))
          .withColumn("sl", sum(col("loo_mean")).over(frame))
          .withColumn("jk_var_milli",
            expr("""9 * sum((10 * loo_mean - sl) * (10 * loo_mean - sl))
                   |over (rows between unbounded preceding and unbounded following)
                   |div 1000""".stripMargin.replace("\n", " ")))
          .select("blk", "n_b", "s_b", "loo_mean", "grand_mean", "jk_var_milli")
          .orderBy("blk")
      }),

    Q(
      "s_grouped_kfold",
      """GROUPED k-fold assignment — the leakage-safe cross-validation
        |split (near-duplicate documents cluster by source; row-level
        |folding would leak them across train/eval): the fold is a pure
        |function of the GROUP key (md5(source || seed) mod 5), so every
        |document of a source lands in the same fold by construction —
        |deterministic, cluster-rerun-stable, and assignable at the scan
        |with zero shuffle. The output carries the proof: per fold the
        |doc/source counts, plus `n_leaky_sources` — sources observed in
        |more than one distinct fold — which the construction pins at 0
        |and the oracle hash turns into a red row if fold assignment
        |ever becomes row-dependent.""".stripMargin,
      Some(
        """WITH f AS (
          |  SELECT doc_id, source,
          |         CAST(list_sum(list_transform(range(1, 13),
          |           i -> (strpos('0123456789abcdef',
          |                   substr(md5(source || ':kfold'), CAST(i AS INTEGER), 1))
          |                 - 1) * power(16, 12 - i))) AS BIGINT) % 5 AS fold
          |  FROM documents),
           |leak AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky_sources FROM (
           |    SELECT source FROM f GROUP BY source
           |    HAVING COUNT(DISTINCT fold) > 1))
           |SELECT fold,
           |       CAST(COUNT(*) AS BIGINT) AS n_docs,
           |       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           |       leak.n_leaky_sources
           |FROM f, leak
           |GROUP BY fold, leak.n_leaky_sources
           |ORDER BY fold""".stripMargin),
      (s, dir) => {
        val f = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            (expr("conv(substring(md5(concat(source, ':kfold')), 1, 12), 16, 10)")
              .cast("long") % 5).as("fold"))
        val leak = f.groupBy("source")
          .agg(countDistinct("fold").as("nf"))
          .filter(col("nf") > 1)
          .agg(count(lit(1)).as("n_leaky_sources"))
        f.groupBy("fold")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("source").as("n_sources"))
          .crossJoin(broadcast(leak))
          .select("fold", "n_docs", "n_sources", "n_leaky_sources")
          .orderBy("fold")
      }),

    Q(
      "s_class_rebalance",
      """Class rebalancing by deterministic oversampling — the
        |minority-upweighting step before training on an imbalanced mix:
        |every language is brought up to EXACTLY the majority class's
        |count. Each doc replicates floor(target/n) times, and the
        |remainder r goes to the r docs with the smallest md5 rank in
        |their class (a pure function of doc_id — cluster-rerun-stable
        |like every sampler here). The replication is generator fan-out
        |at the scan (explode of a per-row sequence); per-class counts
        |broadcast, and the ONE shuffle is the class-keyed
        |remainder-rank window (at 100 TB that becomes a bounded top-r
        |selection — only the r remainder winners need identifying, not
        |a full ranking). Output: per language the original count, the
        |replication parameters, and the post-balance count — equal to
        |the target for every class BY CONSTRUCTION, with a doc_id-sum
        |checksum over the replicated stream proving the fan-out exact.""".stripMargin,
      Some(
        """WITH n AS (
          |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_orig
          |  FROM documents GROUP BY 1),
          |t AS (SELECT MAX(n_orig) AS target FROM n),
          |r AS (
          |  SELECT d.doc_id, d.lang, n.n_orig, t.target,
          |         t.target // n.n_orig AS base_reps,
          |         ROW_NUMBER() OVER (PARTITION BY d.lang
          |                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
          |                                     d.doc_id) AS hrank
          |  FROM documents d JOIN n ON d.lang = n.lang CROSS JOIN t),
          |reps AS (
          |  SELECT doc_id, lang, n_orig, target,
          |         base_reps + CASE WHEN hrank <= target % n_orig
          |                          THEN 1 ELSE 0 END AS k
          |  FROM r),
          |fan AS (
          |  SELECT lang, n_orig, target, doc_id
          |  FROM reps, LATERAL (SELECT unnest(range(k)) AS copy))
          |SELECT lang, MIN(n_orig) AS n_orig, MIN(target) AS target,
          |       CAST(COUNT(*) AS BIGINT) AS n_balanced,
          |       CAST(SUM(doc_id) AS BIGINT) AS doc_sum
          |FROM fan
          |GROUP BY lang
          |ORDER BY lang""".stripMargin),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val n = docs.groupBy("lang").agg(count(lit(1)).as("n_orig"))
        val t = n.agg(max(col("n_orig")).as("target"))
        val hw = Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        docs.select(col("doc_id"), col("lang"))
          .join(broadcast(n), "lang")
          .crossJoin(broadcast(t))
          .withColumn("hrank", row_number().over(hw))
          .withColumn("k",
            expr("target div n_orig") +
              when(col("hrank") <= expr("target % n_orig"), 1L).otherwise(0L))
          .withColumn("copy", explode(expr("sequence(1, k)")))
          .groupBy("lang")
          .agg(min(col("n_orig")).as("n_orig"), min(col("target")).as("target"),
            count(lit(1)).as("n_balanced"), sum(col("doc_id")).as("doc_sum"))
          .orderBy("lang")
      }))
}
