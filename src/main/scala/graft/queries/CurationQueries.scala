package graft.queries

import graft.functions.Text
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-curation operators over the `documents` table — the stages between
  * a raw crawl and the text-quality stack (TextQueries): markup stripping
  * and script-mix detection. Like the other curation queries on the
  * synthetic (plain-ASCII, digit-free) corpus, each query first augments
  * the document with the artifact it detects, built as a closed-form
  * function of doc_id on BOTH engine and oracle sides (the
  * t_pii_scrub/mm_decode_stats pattern), so the detection logic runs for
  * real and the oracle proves its output byte-for-byte. All per-row
  * expression work at the scan: zero shuffle except the output sort.
  */
object CurationQueries {

  val qs: Seq[Q] = Seq(
    Q(
      "t_html_strip",
      """HTML/markup stripping — the first stage of a crawl-to-corpus
        |pipeline: drop <script> blocks wholesale (their CONTENT is not
        |text), flatten remaining tags to spaces, collapse whitespace.
        |Each document is wrapped in closed-form markup (div/h1/p/a, plus a
        |script block on every third doc), then stripped with the same
        |Java/RE2-common-subset regexes on both sides; the oracle proves
        |tag/script counts and the cleaned text byte-for-byte. Scan-side
        |row-local: zero shuffle at any corpus size.""".stripMargin,
      Some(
        """WITH aug AS (
          |  SELECT doc_id,
          |         '<div class="c' || CAST(doc_id % 7 AS VARCHAR) || '"><h1>T'
          |           || CAST(doc_id % 13 AS VARCHAR) || '</h1><p>' || text || '</p>'
          |           || CASE WHEN doc_id % 3 = 0
          |                   THEN '<script>var x = ' || CAST(doc_id % 9 AS VARCHAR) || ';</script>'
          |                   ELSE '' END
          |           || '<a href="/d/' || CAST(doc_id AS VARCHAR) || '">more</a></div>' AS t
          |  FROM documents WHERE text IS NOT NULL)
          |SELECT doc_id,
          |       CAST(len(regexp_extract_all(t, '<[^>]+>')) AS BIGINT) AS n_tags,
          |       CAST(len(regexp_extract_all(t, '<script>[^<]*</script>')) AS BIGINT) AS n_scripts,
          |       trim(regexp_replace(regexp_replace(regexp_replace(t,
          |         '<script>[^<]*</script>', '', 'g'),
          |         '<[^>]+>', ' ', 'g'),
          |         ' +', ' ', 'g')) AS stripped
          |FROM aug
          |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val scriptRe = "<script>[^<]*</script>"
        val tagRe = "<[^>]+>"
        Tables.documents(s, dir)
          .filter(col("text").isNotNull)
          .withColumn("t", concat(
            lit("<div class=\"c"), pmod(col("doc_id"), lit(7)).cast("string"),
            lit("\"><h1>T"), pmod(col("doc_id"), lit(13)).cast("string"),
            lit("</h1><p>"), col("text"), lit("</p>"),
            when(pmod(col("doc_id"), lit(3)) === 0,
              concat(lit("<script>var x = "),
                pmod(col("doc_id"), lit(9)).cast("string"), lit(";</script>")))
              .otherwise(lit("")),
            lit("<a href=\"/d/"), col("doc_id").cast("string"),
            lit("\">more</a></div>")))
          .select(
            col("doc_id"),
            regexp_count(col("t"), lit(tagRe)).cast("long").as("n_tags"),
            regexp_count(col("t"), lit(scriptRe)).cast("long").as("n_scripts"),
            trim(regexp_replace(regexp_replace(regexp_replace(col("t"),
              lit(scriptRe), lit("")),
              lit(tagRe), lit(" ")),
              lit(" +"), lit(" "))).as("stripped"))
          .orderBy("doc_id")
      }),

    Q(
      "t_oov_rate",
      """Out-of-vocabulary rate per document against a corpus-trained
        |vocabulary — the coverage check a tokenizer-training run makes
        |before freezing its vocab: the top-20 tokens by global frequency
        |(ties by token text, the t_vocab_topk ranking) become the
        |vocabulary, aggregated to ONE sorted-array row and broadcast; each
        |doc then counts its tokens outside that set row-locally. OOV share
        |is integer parts-per-million (bigint floor division — no float
        |ties). The corpus never shuffles for the scoring pass: the
        |frequency agg carries vocab cardinality, the vocab travels as one
        |broadcast row.""".stripMargin,
      Some(
        """WITH tok AS (SELECT unnest(string_split(lower(trim(text)), ' ')) AS token
          |             FROM documents),
          |cnt AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY 1),
          |vocab AS (SELECT list(token) AS vlist FROM (
          |  SELECT token FROM cnt ORDER BY n DESC, token LIMIT 20)),
          |docs AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
          |         FROM documents WHERE text IS NOT NULL)
          |SELECT doc_id,
          |       CAST(len(toks) AS BIGINT) AS n_tokens,
          |       CAST(len(list_filter(toks, t -> NOT list_contains(vlist, t))) AS BIGINT)
          |         AS n_oov,
          |       (CAST(len(list_filter(toks, t -> NOT list_contains(vlist, t))) AS BIGINT)
          |          * 1000000) // CAST(len(toks) AS BIGINT) AS oov_ppm
          |FROM docs, vocab
          |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
        val cnt = docs.select(explode(Text.tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
        // rank window runs over vocab-sized aggregated data (bounded,
        // fits one partition — the t_vocab_topk argument)
        val wv = Window.orderBy(col("n").desc, col("token"))
        val vocab = cnt.withColumn("rk", row_number().over(wv))
          .filter(col("rk") <= 20)
          .agg(sort_array(collect_list(col("token"))).as("vlist"))
        // oov is materialized ONCE into a named column (HOF lambdas get
        // no common-subexpression elimination)
        docs.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .crossJoin(broadcast(vocab))
          .withColumn("n_tokens", size(col("toks")).cast("long"))
          .withColumn("n_oov",
            size(filter(col("toks"), t => !array_contains(col("vlist"), t))).cast("long"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            expr("(n_oov * 1000000) div n_tokens").as("oov_ppm"))
          .orderBy("doc_id")
      }),

    Q(
      "dd_url_dedup",
      """URL-canonicalization dedup — the crawl-frontier stage that
        |collapses scheme/host case variants, tracking parameters, fragments
        |and trailing slashes onto one canonical URL before content is ever
        |fetched. Each doc gets a closed-form raw URL (case variant on
        |doc_id%3, trailing slash on %2, utm query on %4, fragment on %5;
        |the canonical target repeats every 160 ids so real duplicate
        |groups form); canonicalization is lowercase + strip-[?#]-suffix +
        |strip-trailing-slash (whole-URL lowercase is a documented
        |simplification — real pipelines fold only the host). The dedup
        |itself is the exact-groups shape: hash groupBy on the derived key,
        |min-id keeper — key-cardinality-sized shuffle at any corpus
        |size.""".stripMargin,
      Some(
        """WITH aug AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.Site'
          |              ELSE 'https://www.site' END
          |           || CAST(doc_id % 40 AS VARCHAR) || '.example.com/Page/'
          |           || CAST(doc_id % 160 AS VARCHAR)
          |           || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
          |           || CASE WHEN doc_id % 4 = 0
          |                   THEN '?utm_source=feed&ref=' || CAST(doc_id AS VARCHAR)
          |                   ELSE '' END
          |           || CASE WHEN doc_id % 5 = 0
          |                   THEN '#sec' || CAST(doc_id % 7 AS VARCHAR)
          |                   ELSE '' END AS url
          |  FROM documents),
          |canon AS (
          |  SELECT doc_id,
          |         regexp_replace(regexp_replace(lower(url), '[?#].*$', ''),
          |                        '/$', '') AS curl
          |  FROM aug)
          |SELECT curl, COUNT(*) AS n_dups, MIN(doc_id) AS keeper
          |FROM canon GROUP BY curl
          |ORDER BY curl""".stripMargin),
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("url", concat(
            when(pmod(col("doc_id"), lit(3)) === 0, lit("HTTPS://WWW.Site"))
              .otherwise(lit("https://www.site")),
            pmod(col("doc_id"), lit(40)).cast("string"), lit(".example.com/Page/"),
            pmod(col("doc_id"), lit(160)).cast("string"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("/")).otherwise(lit("")),
            when(pmod(col("doc_id"), lit(4)) === 0,
              concat(lit("?utm_source=feed&ref="), col("doc_id").cast("string")))
              .otherwise(lit("")),
            when(pmod(col("doc_id"), lit(5)) === 0,
              concat(lit("#sec"), pmod(col("doc_id"), lit(7)).cast("string")))
              .otherwise(lit(""))))
          .withColumn("curl",
            regexp_replace(regexp_replace(lower(col("url")),
              lit("[?#].*$"), lit("")), lit("/$"), lit("")))
          .groupBy("curl")
          .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper"))
          .orderBy("curl"),
    ),

    Q(
      "corpus_pipeline_keepers",
      """The crawl-curation pipeline COMPOSED end-to-end as one query —
        |the oracle row proving the stage composition the way
        |dd_pipeline_keepers does for dedup: (1) URL-canonicalization dedup
        |(dd_url_dedup's closed-form URLs; min-id keeper per canonical URL
        |via a key-partitioned window), (2) HTML strip (t_html_strip's
        |markup + regexes), (3) script-mix gate (t_script_mix's
        |multilingual suffix; keep docs ≤ 20000 ppm non-Latin), (4) quality
        |gate over the STRIPPED text (≥15 tokens, type-token ratio ≥ 25%
        |as integer ppm — no float ties), (5) per-source token budget (≤300
        |cumulative tokens per source in doc_id order — the s_token_budget
        |idea with the scale-correct per-group running sum instead of a
        |global one). Scale shape: stages 1-4 are scan-side expressions
        |plus one curl-keyed window; stage 5 is one source-keyed window;
        |nothing global except the output sort.""".stripMargin,
      Some(
        """WITH d AS (SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL),
          |u AS (
          |  SELECT doc_id, source, text,
          |         regexp_replace(regexp_replace(lower(
          |           CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.Site'
          |                ELSE 'https://www.site' END
          |           || CAST(doc_id % 40 AS VARCHAR) || '.example.com/Page/'
          |           || CAST(doc_id % 160 AS VARCHAR)
          |           || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
          |           || CASE WHEN doc_id % 4 = 0
          |                   THEN '?utm_source=feed&ref=' || CAST(doc_id AS VARCHAR)
          |                   ELSE '' END
          |           || CASE WHEN doc_id % 5 = 0
          |                   THEN '#sec' || CAST(doc_id % 7 AS VARCHAR)
          |                   ELSE '' END),
          |           '[?#].*$', ''), '/$', '') AS curl
          |  FROM d),
          |k1 AS (
          |  SELECT doc_id, source, text FROM (
          |    SELECT *, MIN(doc_id) OVER (PARTITION BY curl) AS keeper FROM u)
          |  WHERE doc_id = keeper),
          |s AS (
          |  SELECT doc_id, source,
          |         trim(regexp_replace(regexp_replace(regexp_replace(
          |           '<div class="c' || CAST(doc_id % 7 AS VARCHAR) || '"><h1>T'
          |             || CAST(doc_id % 13 AS VARCHAR) || '</h1><p>' || text || '</p>'
          |             || CASE WHEN doc_id % 3 = 0
          |                     THEN '<script>var x = ' || CAST(doc_id % 9 AS VARCHAR) || ';</script>'
          |                     ELSE '' END
          |             || '<a href="/d/' || CAST(doc_id AS VARCHAR) || '">more</a></div>',
          |           '<script>[^<]*</script>', '', 'g'),
          |           '<[^>]+>', ' ', 'g'),
          |           ' +', ' ', 'g')) AS stripped
          |  FROM k1),
          |g AS (
          |  SELECT doc_id, source, stripped,
          |         CAST(len(regexp_extract_all(t, '[A-Za-z]')) AS BIGINT) AS n_latin,
          |         CAST(len(regexp_extract_all(t,
          |           '[\x{0400}-\x{04FF}\x{4E00}-\x{9FFF}\x{0370}-\x{03FF}]')) AS BIGINT)
          |           AS n_nonlatin
          |  FROM (SELECT *, stripped || CASE doc_id % 4
          |          WHEN 0 THEN ' привет мир'
          |          WHEN 1 THEN ' 你好世界'
          |          WHEN 2 THEN ' γεια σου'
          |          ELSE '' END AS t FROM s)),
          |g2 AS (
          |  SELECT doc_id, source, stripped,
          |         (n_nonlatin * 1000000) // (n_latin + n_nonlatin) AS nonlatin_ppm
          |  FROM g
          |  WHERE (n_nonlatin * 1000000) // (n_latin + n_nonlatin) <= 20000),
          |q AS (
          |  SELECT doc_id, source, nonlatin_ppm,
          |         CAST(len(string_split(lower(trim(stripped)), ' ')) AS BIGINT) AS n_tokens,
          |         (CAST(len(list_distinct(string_split(lower(trim(stripped)), ' '))) AS BIGINT)
          |            * 1000000)
          |           // CAST(len(string_split(lower(trim(stripped)), ' ')) AS BIGINT) AS ttr_ppm
          |  FROM g2),
          |qf AS (SELECT * FROM q WHERE n_tokens >= 15 AND ttr_ppm >= 250000),
          |b AS (
          |  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
          |              AS cum_tokens
          |  FROM qf)
          |SELECT doc_id, source, n_tokens, ttr_ppm, nonlatin_ppm, cum_tokens
          |FROM b WHERE cum_tokens <= 300
          |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val scriptRe = "<script>[^<]*</script>"
        val tagRe = "<[^>]+>"
        val nonLatinRe = "[\\x{0400}-\\x{04FF}\\x{4E00}-\\x{9FFF}\\x{0370}-\\x{03FF}]"
        val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
        // stage 1: URL canonical dedup, min-id keeper per canonical URL
        val urlRaw = concat(
          when(pmod(col("doc_id"), lit(3)) === 0, lit("HTTPS://WWW.Site"))
            .otherwise(lit("https://www.site")),
          pmod(col("doc_id"), lit(40)).cast("string"), lit(".example.com/Page/"),
          pmod(col("doc_id"), lit(160)).cast("string"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit("/")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit("?utm_source=feed&ref="), col("doc_id").cast("string")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit("#sec"), pmod(col("doc_id"), lit(7)).cast("string")))
            .otherwise(lit("")))
        val kw = Window.partitionBy("curl")
        val k1 = docs
          .withColumn("curl",
            regexp_replace(regexp_replace(lower(urlRaw),
              lit("[?#].*$"), lit("")), lit("/$"), lit("")))
          .withColumn("keeper", min(col("doc_id")).over(kw))
          .filter(col("doc_id") === col("keeper"))
        // stage 2: markup wrap + strip
        val marked = concat(
          lit("<div class=\"c"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit("\"><h1>T"), pmod(col("doc_id"), lit(13)).cast("string"),
          lit("</h1><p>"), col("text"), lit("</p>"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("<script>var x = "),
              pmod(col("doc_id"), lit(9)).cast("string"), lit(";</script>")))
            .otherwise(lit("")),
          lit("<a href=\"/d/"), col("doc_id").cast("string"),
          lit("\">more</a></div>"))
        val s2 = k1.withColumn("stripped",
          trim(regexp_replace(regexp_replace(regexp_replace(marked,
            lit(scriptRe), lit("")), lit(tagRe), lit(" ")), lit(" +"), lit(" "))))
        // stage 3: script-mix gate over stripped + multilingual suffix
        val g2 = s2
          .withColumn("t", concat(col("stripped"),
            when(pmod(col("doc_id"), lit(4)) === 0, lit(" привет мир"))
              .when(pmod(col("doc_id"), lit(4)) === 1, lit(" 你好世界"))
              .when(pmod(col("doc_id"), lit(4)) === 2, lit(" γεια σου"))
              .otherwise(lit(""))))
          .withColumn("n_latin", regexp_count(col("t"), lit("[A-Za-z]")).cast("long"))
          .withColumn("n_nonlatin", regexp_count(col("t"), lit(nonLatinRe)).cast("long"))
          .withColumn("nonlatin_ppm",
            expr("(n_nonlatin * 1000000) div (n_latin + n_nonlatin)"))
          .filter(col("nonlatin_ppm") <= 20000)
        // stage 4: quality gate on the STRIPPED text (tokens materialized
        // once — HOF lambdas get no common-subexpression elimination)
        val q = g2
          .withColumn("toks", Text.tokens(col("stripped")))
          .withColumn("n_tokens", size(col("toks")).cast("long"))
          .withColumn("ttr_ppm", expr(
            "(cast(size(array_distinct(toks)) as bigint) * 1000000) div n_tokens"))
          .filter(col("n_tokens") >= 15 && col("ttr_ppm") >= 250000)
        // stage 5: per-source token budget — group-local running sum
        val bw = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        q.withColumn("cum_tokens", sum(col("n_tokens")).over(bw))
          .filter(col("cum_tokens") <= 300)
          .select("doc_id", "source", "n_tokens", "ttr_ppm", "nonlatin_ppm",
            "cum_tokens")
          .orderBy("doc_id")
      }),

    Q(
      "t_script_mix",
      """Unicode script-mix detection — the language-routing signal a
        |multilingual pretraining pipeline computes before language-ID
        |proper: per-script character counts (Latin, Cyrillic, CJK, Greek)
        |and the dominant non-Latin script. Docs get a closed-form
        |multilingual suffix keyed on doc_id % 4 (Cyrillic / CJK / Greek /
        |none), counts use \x{....} codepoint-class regexes (the syntax
        |Java and RE2 share), and the non-Latin share is integer
        |parts-per-million (bigint floor division — no float ties by
        |construction). Scan-side row-local.""".stripMargin,
      Some(
        """WITH aug AS (
          |  SELECT doc_id,
          |         text || CASE doc_id % 4
          |           WHEN 0 THEN ' привет мир'
          |           WHEN 1 THEN ' 你好世界'
          |           WHEN 2 THEN ' γεια σου'
          |           ELSE '' END AS t
          |  FROM documents WHERE text IS NOT NULL)
          |SELECT doc_id,
          |       CAST(len(regexp_extract_all(t, '[A-Za-z]')) AS BIGINT) AS n_latin,
          |       CAST(len(regexp_extract_all(t, '[\x{0400}-\x{04FF}]')) AS BIGINT) AS n_cyrillic,
          |       CAST(len(regexp_extract_all(t, '[\x{4E00}-\x{9FFF}]')) AS BIGINT) AS n_cjk,
          |       CAST(len(regexp_extract_all(t, '[\x{0370}-\x{03FF}]')) AS BIGINT) AS n_greek,
          |       CASE
          |         WHEN len(regexp_extract_all(t, '[\x{0400}-\x{04FF}]'))
          |            + len(regexp_extract_all(t, '[\x{4E00}-\x{9FFF}]'))
          |            + len(regexp_extract_all(t, '[\x{0370}-\x{03FF}]')) = 0 THEN 'none'
          |         WHEN len(regexp_extract_all(t, '[\x{0400}-\x{04FF}]')) >=
          |              len(regexp_extract_all(t, '[\x{4E00}-\x{9FFF}]'))
          |          AND len(regexp_extract_all(t, '[\x{0400}-\x{04FF}]')) >=
          |              len(regexp_extract_all(t, '[\x{0370}-\x{03FF}]')) THEN 'cyrillic'
          |         WHEN len(regexp_extract_all(t, '[\x{4E00}-\x{9FFF}]')) >=
          |              len(regexp_extract_all(t, '[\x{0370}-\x{03FF}]')) THEN 'cjk'
          |         ELSE 'greek' END AS dominant_nonlatin,
          |       (CAST(len(regexp_extract_all(t, '[\x{0400}-\x{04FF}]'))
          |           + len(regexp_extract_all(t, '[\x{4E00}-\x{9FFF}]'))
          |           + len(regexp_extract_all(t, '[\x{0370}-\x{03FF}]')) AS BIGINT) * 1000000)
          |         // (CAST(len(regexp_extract_all(t, '[A-Za-z]')) AS BIGINT)
          |            + len(regexp_extract_all(t, '[\x{0400}-\x{04FF}]'))
          |            + len(regexp_extract_all(t, '[\x{4E00}-\x{9FFF}]'))
          |            + len(regexp_extract_all(t, '[\x{0370}-\x{03FF}]'))) AS nonlatin_ppm
          |FROM aug
          |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val cyrRe = "[\\x{0400}-\\x{04FF}]"
        val cjkRe = "[\\x{4E00}-\\x{9FFF}]"
        val greekRe = "[\\x{0370}-\\x{03FF}]"
        // counts are materialized into named columns once — the dominant
        // CASE and the ppm division reuse them (no common-subexpression
        // elimination inside expression trees to rely on)
        Tables.documents(s, dir)
          .filter(col("text").isNotNull)
          .withColumn("t", concat(col("text"),
            when(pmod(col("doc_id"), lit(4)) === 0, lit(" привет мир"))
              .when(pmod(col("doc_id"), lit(4)) === 1, lit(" 你好世界"))
              .when(pmod(col("doc_id"), lit(4)) === 2, lit(" γεια σου"))
              .otherwise(lit(""))))
          .withColumn("n_latin", regexp_count(col("t"), lit("[A-Za-z]")).cast("long"))
          .withColumn("n_cyrillic", regexp_count(col("t"), lit(cyrRe)).cast("long"))
          .withColumn("n_cjk", regexp_count(col("t"), lit(cjkRe)).cast("long"))
          .withColumn("n_greek", regexp_count(col("t"), lit(greekRe)).cast("long"))
          .withColumn("n_nonlatin", col("n_cyrillic") + col("n_cjk") + col("n_greek"))
          .select(
            col("doc_id"), col("n_latin"), col("n_cyrillic"), col("n_cjk"), col("n_greek"),
            when(col("n_nonlatin") === 0, lit("none"))
              .when(col("n_cyrillic") >= col("n_cjk") &&
                col("n_cyrillic") >= col("n_greek"), lit("cyrillic"))
              .when(col("n_cjk") >= col("n_greek"), lit("cjk"))
              .otherwise(lit("greek")).as("dominant_nonlatin"),
            expr("(n_nonlatin * 1000000) div (n_latin + n_nonlatin)").as("nonlatin_ppm"))
          .orderBy("doc_id")
      }),

    Q(
      "a_weighted_median",
      """Volume-weighted median document length per language — "half the
        |corpus BYTES live in docs shorter than X", the statistic that
        |actually governs token budgets (the plain median over-weights
        |the long tail of small docs). Exact two-stage shape: docs
        |collapse to the (lang, length) frequency frame FIRST (one agg),
        |then the cumulative-weight window and the cutoff test
        |2*cum >= total run over that bounded frame — the same
        |collapsed-frame discipline as the percentile and perplexity
        |queries, so the window never sees the corpus. All integer
        |(weights are char counts; the tie test cross-multiplies), no
        |interpolation — the lower weighted median on both engines.""".stripMargin,
      Some(
        """WITH f AS (
          |  SELECT lang, n_chars,
          |         CAST(SUM(n_chars) AS BIGINT) AS w
          |  FROM documents GROUP BY 1, 2),
          |c AS (
          |  SELECT lang, n_chars, w,
          |         CAST(SUM(w) OVER (PARTITION BY lang ORDER BY n_chars
          |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS BIGINT) AS cum,
          |         CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT) AS tot
          |  FROM f),
          |m AS (
          |  SELECT lang, MIN(n_chars) AS wmedian_chars, MIN(tot) AS total_chars
          |  FROM c WHERE 2 * cum >= tot GROUP BY 1),
          |d AS (
          |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
          |  FROM documents GROUP BY 1)
          |SELECT m.lang, m.wmedian_chars, m.total_chars, d.n_docs
          |FROM m JOIN d USING (lang)
          |ORDER BY lang""".stripMargin),
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val f = docs.groupBy("lang", "n_chars")
          .agg(sum(col("n_chars")).as("w"))
        val cumW = Window.partitionBy("lang").orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val totW = Window.partitionBy("lang")
        val m = f
          .withColumn("cum", sum(col("w")).over(cumW))
          .withColumn("tot", sum(col("w")).over(totW))
          .filter(col("cum") * 2 >= col("tot"))
          .groupBy("lang")
          .agg(min(col("n_chars")).as("wmedian_chars"),
            min(col("tot")).as("total_chars"))
        val d = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
        m.join(d, "lang")
          .select("lang", "wmedian_chars", "total_chars", "n_docs")
          .orderBy("lang")
      }),

    Q(
      "a_group_percentiles",
      """Per-group exact p50/p90/p99 — the latency-dashboard staple
        |(SLO tails per service; here value tails per event type), and
        |the multi-cut generalization of a_weighted_median: values
        |collapse to the (type, floor-micro value) frequency frame
        |FIRST, ONE cumulative window per type runs over that bounded
        |frame, and all three cutoffs read off the same pass via
        |conditional MIN (cum·100 >= p·n, integer cross-multiplication —
        |no interpolation, the lower percentile on both engines). The
        |window cost is |distinct values| per group regardless of row
        |count — the property that keeps a p99-per-service query
        |runnable over a 100 TB event log.""".stripMargin,
      Some(
        """WITH f AS (
          |  SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS vm,
          |         CAST(COUNT(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1, 2),
          |c AS (
          |  SELECT event_type, vm, c,
          |         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY vm
          |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |           AS BIGINT) AS cum,
          |         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
          |  FROM f)
          |SELECT event_type, MIN(n) AS n_rows,
          |       MIN(CASE WHEN cum * 100 >= 50 * n THEN vm END) AS p50_micro,
          |       MIN(CASE WHEN cum * 100 >= 90 * n THEN vm END) AS p90_micro,
          |       MIN(CASE WHEN cum * 100 >= 99 * n THEN vm END) AS p99_micro
          |FROM c GROUP BY 1
          |ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val f = Tables.events(s, dir)
          .groupBy(col("event_type"),
            floor(col("value") * 1000000L).cast("long").as("vm"))
          .agg(count(lit(1)).as("c"))
        val cumW = Window.partitionBy("event_type").orderBy("vm")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val totW = Window.partitionBy("event_type")
        f.withColumn("cum", sum(col("c")).over(cumW))
          .withColumn("n", sum(col("c")).over(totW))
          .groupBy("event_type")
          .agg(min(col("n")).as("n_rows"),
            min(when(col("cum") * 100 >= col("n") * 50, col("vm"))).as("p50_micro"),
            min(when(col("cum") * 100 >= col("n") * 90, col("vm"))).as("p90_micro"),
            min(when(col("cum") * 100 >= col("n") * 99, col("vm"))).as("p99_micro"))
          .orderBy("event_type")
      }),

    Q(
      "a_gini_concentration",
      """Source-concentration Gini per language — the corpus-governance
        |diversity metric (is one crawl source dominating the training
        |mix?): per (lang, source) char volumes rank ascending and the
        |Gini index derives from the rank-weighted sum,
        |G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)), emitted in
        |exact integer ppm (cross-multiplied, truncating division — no
        |float anywhere). The rank window runs over the collapsed
        |(lang, source) frame — 20 rows per language regardless of
        |corpus size — after ONE volume aggregation; ties rank by source
        |name, identically on both engines. 0 ppm = perfectly even,
        |1e6*(n-1)/n = one source holds everything.""".stripMargin,
      Some(
        """WITH v AS (
          |  SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS x
          |  FROM documents GROUP BY 1, 2),
          |r AS (
          |  SELECT lang, source, x,
          |         CAST(ROW_NUMBER() OVER (PARTITION BY lang
          |                                 ORDER BY x, source) AS BIGINT) AS i
          |  FROM v),
          |g AS (
          |  SELECT lang,
          |         CAST(COUNT(*) AS BIGINT) AS n_sources,
          |         CAST(SUM(i * x) AS BIGINT) AS rx,
          |         CAST(SUM(x) AS BIGINT) AS sx
          |  FROM r GROUP BY 1)
          |SELECT lang, n_sources, sx AS total_chars,
          |       CAST((2 * rx - (n_sources + 1) * sx) * 1000000
          |            // (n_sources * sx) AS BIGINT) AS gini_ppm
          |FROM g
          |ORDER BY lang""".stripMargin),
      (s, dir) => {
        val v = Tables.documents(s, dir)
          .groupBy("lang", "source")
          .agg(sum(col("n_chars")).as("x"))
        val rw = Window.partitionBy("lang").orderBy(col("x"), col("source"))
        v.withColumn("i", row_number().over(rw).cast("long"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sources"),
            sum(expr("i * x")).as("rx"),
            sum(col("x")).as("sx"))
          .select(col("lang"), col("n_sources"), col("sx").as("total_chars"),
            expr("(2 * rx - (n_sources + 1) * sx) * 1000000" +
              " div (n_sources * sx)").as("gini_ppm"))
          .orderBy("lang")
      }))
}
