package graft.queries

import graft.ops.Lineage._
import graft.functions.Text
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operator family over `documents` (training-data pipeline
  * extension): exact/normalized hash dedup, n-gram Jaccard with blocking,
  * MinHash+LSH banding, SimHash bit-fingerprints.
  *
  * Scale design: every variant is either (a) a per-row expression at the
  * scan (simhash, normalized keys), (b) a hash aggregate on a derived key
  * (exact dedup, LSH bands — shuffle is key-cardinality-sized), or (c) a
  * blocked pairwise compare where the blocking key bounds the quadratic
  * term (Jaccard within source). Nothing is driver-side.
  */
object DedupQueries {

  private val nSeeds = 8
  private val bandSize = 4 // 2 bands of 4 seeds

  /** Shared closure oracle for both connected-components variants: the
    * min-reachable-doc_id per node over the union of the two similarity
    * edge sets, as a recursive CTE. Label propagation and large-star/
    * small-star alternation must both converge to exactly this answer.
    */
  private val connComponentsOracle =
    """WITH keyed AS (
      |  SELECT doc_id,
      |         md5(array_to_string(list_sort(list_distinct(
      |           string_split(lower(trim(text)), ' '))), ' ')) AS norm_key,
      |         list_min(list_transform(
      |           list_transform(range(len(string_split(lower(trim(text)), ' ')) - 4),
      |             i -> concat_ws(' ',
      |                    string_split(lower(trim(text)), ' ')[i+1],
      |                    string_split(lower(trim(text)), ' ')[i+2],
      |                    string_split(lower(trim(text)), ' ')[i+3],
      |                    string_split(lower(trim(text)), ' ')[i+4],
      |                    string_split(lower(trim(text)), ' ')[i+5])),
      |           s -> md5(s))) AS winnow_fp
      |  FROM documents),
      |e1 AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst FROM keyed a JOIN keyed b
      |  ON a.norm_key = b.norm_key AND a.doc_id <> b.doc_id),
      |e2 AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst FROM keyed a JOIN keyed b
      |  ON a.winnow_fp = b.winnow_fp AND a.doc_id <> b.doc_id),
      |edges AS (SELECT * FROM e1 UNION SELECT * FROM e2),
      |reach AS (
      |  WITH RECURSIVE r(a, b) AS (
      |    SELECT doc_id, doc_id FROM keyed
      |    UNION
      |    SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
      |  ) SELECT * FROM r)
      |SELECT a AS doc_id, MIN(b) AS component FROM reach
      |GROUP BY a
      |ORDER BY doc_id""".stripMargin

  /** The (nodes, star-edge) pair both CC variants run over: documents
    * keyed by normalized token set and winnowing fingerprint, edges the
    * union of the two key groups' star forms. Caller must unpersist the
    * returned nodes frame after the fixpoint.
    */
  private def connComponentsInput(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val keyed = Tables.documents(s, dir)
      .withColumn("toks", Text.tokens(col("text")))
      .select(
        col("doc_id"),
        Text.normalizedKey(col("text")).as("norm_key"),
        Text.winnowOfTokens(col("toks"), 5).as("winnow_fp"))
      .persist()
    // Star edges (ConnectedComponents.starEdges), never all-pairs: a
    // k-member duplicate group emits 2(k-1) member<->min-root edges
    // with the exact connectivity of the oracle's k(k-1) clique —
    // linear in input on the heavy-tailed group sizes dedup data has.
    val edges = graft.ops.ConnectedComponents
      .starEdges(keyed, "doc_id", "norm_key")
      .union(graft.ops.ConnectedComponents.starEdges(keyed, "doc_id", "winnow_fp"))
    (keyed, edges)
  }

  val qs: Seq[Q] = Seq(
    Q(
      "dd_entity_resolution",
      """Entity resolution end-to-end — the MDM composition: (1) BLOCK
        |customer records on (nationkey, name[1:17]) so candidate pairs
        |form only inside tiny blocks, never all-pairs; (2) SCORE pairs
        |with the banded levenshtein(.,.,1) (early-exit codegen; the
        |oracle computes the full distance and filters — the band is
        |semantics-neutral); (3) CLOSE transitively with the same
        |min-label connected-components fixpoint the dedup clusters use
        |(A~B, B~C => one entity even when A,C were never compared);
        |(4) ELECT the golden record: the min-custkey member is the
        |entity id, and the merged attribute (max member balance, exact
        |cents) propagates to every member. Output: every member of a
        |multi-member entity with its entity id, size, merged balance,
        |and canonical flag. Scale shape: pair generation is
        |block-bounded equi-join work; the closure is the star-edge
        |fixpoint (log-diameter rounds of key-shuffle join+min-agg);
        |election is one entity-keyed aggregate joined back.""".stripMargin,
      Some(
        """WITH c AS (
          |  SELECT c_custkey AS id, c_name AS nm, c_nationkey AS nk,
          |         substr(c_name, 1, 17) AS bk,
          |         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal
          |  FROM customer),
          |pairs AS MATERIALIZED (
          |  SELECT a.id AS u, b.id AS v
          |  FROM c a JOIN c b ON a.nk = b.nk AND a.bk = b.bk AND a.id < b.id
          |  WHERE levenshtein(a.nm, b.nm) <= 1),
          |edges AS MATERIALIZED (
          |  SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
          |reach AS (
          |  WITH RECURSIVE r(a, b) AS (
          |    SELECT id, id FROM c
          |    UNION
          |    SELECT r.a, e.v FROM r JOIN edges e ON r.b = e.u
          |  ) SELECT * FROM r),
          |lab AS (SELECT a AS id, MIN(b) AS entity_id FROM reach GROUP BY a),
          |ent AS (
          |  SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members,
          |         CAST(MAX(c.bal) AS BIGINT) AS max_bal_cents
          |  FROM lab JOIN c USING (id) GROUP BY entity_id)
          |SELECT lab.id AS custkey, lab.entity_id, ent.n_members,
          |       ent.max_bal_cents,
          |       CAST(CASE WHEN lab.id = lab.entity_id THEN 1 ELSE 0 END AS BIGINT)
          |         AS is_canonical
          |FROM lab JOIN ent USING (entity_id)
          |WHERE ent.n_members >= 2
          |ORDER BY custkey""".stripMargin),
      (s, dir) => {
        val c = Tables.customer(s, dir).select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          substring(col("c_name"), 1, 17).as("bk"),
          floor(col("c_acctbal") * 100).cast("long").as("bal"))
        val a = c.select(col("c_custkey").as("u"), col("c_name").as("un"),
          col("c_nationkey").as("nk"), col("bk"))
        val b = c.select(col("c_custkey").as("v"), col("c_name").as("vn"),
          col("c_nationkey").as("nk"), col("bk"))
        val pairs = a.join(b, Seq("nk", "bk"))
          .filter(col("u") < col("v") &&
            levenshtein(col("un"), col("vn"), 1) >= 0)
          .select(col("u"), col("v"))
        val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
          .union(pairs.select(col("v").as("src"), col("u").as("dst")))
        val (labels, rounds) = graft.ops.ConnectedComponents.run(
          c.select(col("c_custkey")), edges, "c_custkey")
        Console.err.println(s"[dd_entity_resolution] closure in $rounds rounds")
        val ent = labels.join(c, "c_custkey")
          .groupBy(col("component").as("entity_id"))
          .agg(count(lit(1)).as("n_members"), max("bal").as("max_bal_cents"))
          .filter(col("n_members") >= 2)
        labels.select(col("c_custkey").as("custkey"), col("component").as("entity_id"))
          .join(ent, "entity_id")
          .select(col("custkey"), col("entity_id"), col("n_members"),
            col("max_bal_cents"),
            when(col("custkey") === col("entity_id"), 1L).otherwise(0L).as("is_canonical"))
          .orderBy("custkey")
      }),

    Q(
      "dd_exact_groups",
      """Exact + normalized dedup: md5 over the raw text (byte identity)
        |and over the sorted distinct token set (word-order-insensitive).
        |Output is per normalized key: group size, keeper (min doc_id),
        |whether the group is byte-identical too. Hash groupBy — the
        |canonical first dedup pass at any scale.""".stripMargin,
      Some(
        """SELECT md5(array_to_string(list_sort(list_distinct(
          |         string_split(lower(trim(text)), ' '))), ' ')) AS norm_key,
          |       COUNT(*) AS n_docs,
          |       MIN(doc_id) AS keeper,
          |       (COUNT(DISTINCT md5(text)) = 1) AS byte_identical
          |FROM documents
          |GROUP BY 1
          |ORDER BY norm_key""".stripMargin),
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy(Text.normalizedKey(col("text")).as("norm_key"))
          .agg(
            count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("keeper"),
            (countDistinct(Text.fingerprint(col("text"))) === 1).as("byte_identical"))
          .orderBy("norm_key")),

    Q(
      "dd_soft_weights",
      """SOFT dedup — down-weight duplicates instead of dropping them (the
        |suppression-free alternative: every duplicate group's total
        |sampling mass stays 1, so a document repeated n times trains with
        |weight 1/n instead of either full weight or zero). Per doc: its
        |normalized-key group size, the integer-ppm sampling weight
        |1000000 div size (no float ties), and whether it is the group's
        |keeper under hard dedup — the comparison column a pipeline uses
        |to choose between the two policies. One hash exchange on the
        |content key serves both window aggregates; no join, no second
        |corpus scan.""".stripMargin,
      Some(
        """WITH keyed AS (
          |  SELECT doc_id,
          |         md5(array_to_string(list_sort(list_distinct(
          |           string_split(lower(trim(text)), ' '))), ' ')) AS norm_key
          |  FROM documents)
          |SELECT doc_id, norm_key,
          |       COUNT(*) OVER (PARTITION BY norm_key) AS group_size,
          |       1000000 // COUNT(*) OVER (PARTITION BY norm_key) AS weight_ppm,
          |       (doc_id = MIN(doc_id) OVER (PARTITION BY norm_key)) AS is_keeper
          |FROM keyed
          |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("norm_key")
        Tables.documents(s, dir)
          .select(col("doc_id"), Text.normalizedKey(col("text")).as("norm_key"))
          .withColumn("group_size", count(lit(1)).over(w))
          .select(col("doc_id"), col("norm_key"), col("group_size"),
            expr("1000000 div group_size").as("weight_ppm"),
            (col("doc_id") === min(col("doc_id")).over(w)).as("is_keeper"))
          .orderBy("doc_id")
      }),

    Q(
      "dd_ngram_jaccard",
      """N-gram Jaccard near-dup with blocking: 3-word shingles, candidate
        |pairs restricted to the same `source` (the blocking key that bounds
        |the quadratic term — at 100 TB this is the shard/bucket key), true
        |Jaccard |A∩B|/|A∪B| from distinct-shingle counts, threshold 0.05.
        |The shingle self-join shuffles on (source, shingle); per-doc
        |shingle sets are distinct'd first so the join is set-sized.""".stripMargin,
      Some(
        """WITH sh AS (
          |  SELECT DISTINCT doc_id, source, unnest(list_transform(
          |    range(len(string_split(lower(trim(text)), ' ')) - 2),
          |    i -> concat_ws(' ',
          |           string_split(lower(trim(text)), ' ')[i+1],
          |           string_split(lower(trim(text)), ' ')[i+2],
          |           string_split(lower(trim(text)), ' ')[i+3]))) AS shingle
          |  FROM documents
          |  WHERE len(string_split(lower(trim(text)), ' ')) >= 3),
          |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
          |  FROM sh a JOIN sh b
          |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT doc_a, doc_b, n_inter,
          |       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
          |FROM inter
          |JOIN sizes sa ON sa.doc_id = doc_a
          |JOIN sizes sb ON sb.doc_id = doc_b
          |WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.05
          |ORDER BY doc_a, doc_b""".stripMargin),
      (s, dir) => {
        // Blocked pairwise sets, NOT a shingle self-join: an equi-join on
        // the shared shingle produces sum-over-shingles(k^2) rows (ruinous
        // when shingles are common). Instead: per-doc DISTINCT shingle sets
        // hashed to int64 (xxhash64 — string intersects are ~10x costlier
        // and 64-bit collisions are negligible for counting), one row per
        // pair via a BROADCAST join on the block key (the set table is one
        // row per doc), intersect row-local. Nothing shuffles but the final
        // tiny ordered output. Pairs with empty intersection fall out at
        // the threshold filter, so semantics match the oracle's inner join.
        // At 100 TB the set table outgrows broadcast — the scale path is
        // LSH candidate pairs (dd_minhash_lsh) feeding this same row-local
        // exact-Jaccard confirm.
        // sorted + distinct ONCE per doc; the per-pair intersect is then a
        // zero-allocation native merge walk (SortedIntersectCountExpression
        // — array_intersect's per-pair boxed hash sets were the dominant
        // GC load of the whole bench)
        val sets = Tables.documents(s, dir)
          .withColumn("toks", Text.tokens(col("text")))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), col("source"),
            array_sort(array_distinct(
              transform(Text.shinglesOfTokens(col("toks"), 3), sh => xxhash64(sh)))).as("sh"))
          .withColumn("n_sh", size(col("sh")))
        val a = sets.select(col("source"), col("doc_id").as("doc_a"),
          col("sh").as("sh_a"), col("n_sh").as("n_a"))
        val b = sets.select(col("source"), col("doc_id").as("doc_b"),
          col("sh").as("sh_b"), col("n_sh").as("n_b"))
        val paired = a.join(broadcast(b), Seq("source")).filter(col("doc_a") < col("doc_b"))
          .withColumn("n_inter", {
            import org.apache.spark.sql.GraftColumnBridge
            GraftColumnBridge.column(graft.plans.SortedIntersectCountExpression(
              GraftColumnBridge.expression(col("sh_a")),
              GraftColumnBridge.expression(col("sh_b"))))
          })
        val jac = col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))
        paired
          .filter(jac >= 0.05)
          .select(col("doc_a"), col("doc_b"), col("n_inter"), round(jac, 6).as("jaccard"))
          .orderBy("doc_a", "doc_b")
      }),

    Q(
      "dd_containment",
      """Containment similarity (asymmetric doc-in-doc detection, the
        |measure used beside Jaccard for finding quotes/inclusions —
        |near-containment catches a short article embedded in a longer
        |page that symmetric Jaccard misses): same blocked distinct-
        |shingle sets and row-local native intersect as dd_ngram_jaccard,
        |but scoring |A∩B|/|A| and |A∩B|/|B| separately, keeping pairs
        |where either direction ≥ 0.5. Containment ratios are INTEGER
        |micro-units via half-up FLOOR((2a+b)/2b) — c/|A| can land on a
        |non-representable 6-dp tie (|A| with 2^k·5 factors), where
        |round() diverges between engines.""".stripMargin,
      Some(
        """WITH sh AS (
          |  SELECT DISTINCT doc_id, source, unnest(list_transform(
          |    range(len(string_split(lower(trim(text)), ' ')) - 2),
          |    i -> concat_ws(' ',
          |           string_split(lower(trim(text)), ' ')[i+1],
          |           string_split(lower(trim(text)), ' ')[i+2],
          |           string_split(lower(trim(text)), ' ')[i+3]))) AS shingle
          |  FROM documents
          |  WHERE len(string_split(lower(trim(text)), ' ')) >= 3),
          |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
          |  FROM sh a JOIN sh b
          |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |c AS (
          |  SELECT doc_a, doc_b, sa.n_sh AS n_a, sb.n_sh AS n_b, n_inter,
          |         CAST(FLOOR(CAST(2000000 * n_inter + sa.n_sh AS DOUBLE)
          |                    / (2 * sa.n_sh)) AS BIGINT) AS ca_micro,
          |         CAST(FLOOR(CAST(2000000 * n_inter + sb.n_sh AS DOUBLE)
          |                    / (2 * sb.n_sh)) AS BIGINT) AS cb_micro
          |  FROM inter
          |  JOIN sizes sa ON sa.doc_id = doc_a
          |  JOIN sizes sb ON sb.doc_id = doc_b)
          |SELECT doc_a, doc_b, n_a, n_b, n_inter,
          |       ca_micro / 1000000.0 AS cont_a,
          |       cb_micro / 1000000.0 AS cont_b
          |FROM c
          |WHERE GREATEST(ca_micro, cb_micro) >= 500000
          |ORDER BY doc_a, doc_b""".stripMargin),
      (s, dir) => {
        // identical blocked-set/broadcast/native-intersect shape as
        // dd_ngram_jaccard (see the scale rationale there); only the
        // scoring differs
        val sets = Tables.documents(s, dir)
          .withColumn("toks", Text.tokens(col("text")))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), col("source"),
            array_sort(array_distinct(
              transform(Text.shinglesOfTokens(col("toks"), 3), sh => xxhash64(sh)))).as("sh"))
          .withColumn("n_sh", size(col("sh")))
        val a = sets.select(col("source"), col("doc_id").as("doc_a"),
          col("sh").as("sh_a"), col("n_sh").as("n_a"))
        val b = sets.select(col("source"), col("doc_id").as("doc_b"),
          col("sh").as("sh_b"), col("n_sh").as("n_b"))
        def contMicro(n: org.apache.spark.sql.Column) =
          floor((lit(2000000L) * col("n_inter") + n) / (lit(2) * n)).cast("long")
        a.join(broadcast(b), Seq("source")).filter(col("doc_a") < col("doc_b"))
          .withColumn("n_inter", {
            import org.apache.spark.sql.GraftColumnBridge
            GraftColumnBridge.column(graft.plans.SortedIntersectCountExpression(
              GraftColumnBridge.expression(col("sh_a")),
              GraftColumnBridge.expression(col("sh_b"))))
          })
          .withColumn("ca_micro", contMicro(col("n_a")))
          .withColumn("cb_micro", contMicro(col("n_b")))
          .filter(greatest(col("ca_micro"), col("cb_micro")) >= 500000)
          .select(col("doc_a"), col("doc_b"),
            col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
            col("n_inter"),
            (col("ca_micro") / lit(1000000.0)).as("cont_a"),
            (col("cb_micro") / lit(1000000.0)).as("cont_b"))
          .orderBy("doc_a", "doc_b")
      }),

    Q(
      "dd_minhash_lsh",
      """MinHash + LSH banding: 8 unigram min-hashes (lexicographic min of
        |md5(seed|token) — md5 hex order == 128-bit numeric order, so no
        |hex->int step), banded 2x4; output is band-collision groups with
        |>= 2 members (the candidate-pair generator). Per-doc signatures are
        |row-local folds; the only shuffle is the band-key aggregate.""".stripMargin,
      Some {
        val mins = (0 until nSeeds)
          .map(i => s"list_min(list_transform(toks, w -> md5('$i|' || w))) AS h$i")
          .mkString(",\n         ")
        val b0 = (0 until bandSize).map(i => s"h$i").mkString(" || ")
        val b1 = (bandSize until nSeeds).map(i => s"h$i").mkString(" || ")
        s"""WITH sig AS (
           |  SELECT doc_id,
           |         $mins
           |  FROM (SELECT doc_id,
           |               list_distinct(string_split(lower(trim(text)), ' ')) AS toks
           |        FROM documents)),
           |bands AS (
           |  SELECT doc_id, 0 AS band_id, md5($b0) AS band_key FROM sig
           |  UNION ALL
           |  SELECT doc_id, 1 AS band_id, md5($b1) AS band_key FROM sig)
           |SELECT band_id, band_key, COUNT(*) AS n_docs,
           |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
           |FROM bands
           |GROUP BY 1, 2
           |HAVING COUNT(*) >= 2
           |ORDER BY band_id, band_key""".stripMargin
      },
      (s, dir) => {
        val toks = array_distinct(Text.tokens(col("text")))
        def minHash(seed: Int) =
          array_min(transform(toks, w => md5(concat(lit(s"$seed|"), w)))).as(s"h$seed")
        val sig = Tables.documents(s, dir)
          .select(col("doc_id") +: (0 until nSeeds).map(minHash): _*)
        val band0 = md5(concat((0 until bandSize).map(i => col(s"h$i")): _*))
        val band1 = md5(concat((bandSize until nSeeds).map(i => col(s"h$i")): _*))
        // one projection + explode, not a union of two sig selects: the
        // union form re-evaluated all 8 per-doc minhash folds (one md5
        // per token per seed) once PER BRANCH — the band keys read
        // disjoint signature halves, so this evaluates each fold once
        val bands = sig.select(col("doc_id"), explode(array(
            struct(lit(0).as("band_id"), band0.as("band_key")),
            struct(lit(1).as("band_id"), band1.as("band_key")))).as("b"))
          .select(col("doc_id"), col("b.band_id").as("band_id"),
            col("b.band_key").as("band_key"))
        bands.groupBy("band_id", "band_key")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .filter(col("n_docs") >= 2)
          .orderBy("band_id", "band_key")
      }),

    Q(
      "dd_minhash_incremental",
      """NEAR-dup arrival increment — the LSH analog of
        |corpus_pipeline_incremental's exact-key index: the persisted
        |state is a BAND INDEX (distinct (band_id, band_key) of the
        |historical corpus with its first-seen doc), and each arriving
        |document (the doc_id % 5 == 0 slice) probes it with its own 2×4
        |band keys. Verdict per new doc: near_dup_history if ANY band
        |collides with history (with the earliest colliding historical
        |doc as evidence), else new. Signatures are row-local folds; the
        |probe is a key-shuffle join on band_key — the index is
        |band-group-sized, lives bucketed by band key at cluster scale,
        |and the arriving batch is the only small side in motion. This is
        |the daily-crawl dedup shape: history is never re-paired against
        |itself, cost is |batch| × band fan-out.""".stripMargin,
      Some {
        val mins = (0 until nSeeds)
          .map(i => s"list_min(list_transform(toks, w -> md5('$i|' || w))) AS h$i")
          .mkString(",\n         ")
        val b0 = (0 until bandSize).map(i => s"h$i").mkString(" || ")
        val b1 = (bandSize until nSeeds).map(i => s"h$i").mkString(" || ")
        s"""WITH sig AS (
           |  SELECT doc_id,
           |         $mins
           |  FROM (SELECT doc_id,
           |               list_distinct(string_split(lower(trim(text)), ' ')) AS toks
           |        FROM documents)),
           |bands AS (
           |  SELECT doc_id, 0 AS band_id, md5($b0) AS band_key FROM sig
           |  UNION ALL
           |  SELECT doc_id, 1 AS band_id, md5($b1) AS band_key FROM sig),
           |idx AS (
           |  SELECT band_id, band_key, MIN(doc_id) AS first_hist
           |  FROM bands WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
           |probe AS (
           |  SELECT doc_id, band_id, band_key FROM bands WHERE doc_id % 5 = 0),
           |hits AS (
           |  SELECT p.doc_id,
           |         CAST(COUNT(i.first_hist) AS BIGINT) AS n_hit_bands,
           |         MIN(i.first_hist) AS first_hist_match
           |  FROM probe p LEFT JOIN idx i USING (band_id, band_key)
           |  GROUP BY p.doc_id)
           |SELECT doc_id, n_hit_bands, first_hist_match,
           |       CASE WHEN n_hit_bands > 0 THEN 'near_dup_history'
           |            ELSE 'new' END AS verdict
           |FROM hits ORDER BY doc_id""".stripMargin
      },
      (s, dir) => {
        val toks = array_distinct(Text.tokens(col("text")))
        def minHash(seed: Int) =
          array_min(transform(toks, w => md5(concat(lit(s"$seed|"), w)))).as(s"h$seed")
        val sig = Tables.documents(s, dir)
          .select(col("doc_id") +: (0 until nSeeds).map(minHash): _*)
        val band0 = md5(concat((0 until bandSize).map(i => col(s"h$i")): _*))
        val band1 = md5(concat((bandSize until nSeeds).map(i => col(s"h$i")): _*))
        val bands = sig
          .select(col("doc_id"), lit(0).as("band_id"), band0.as("band_key"))
          .unionAll(sig
            .select(col("doc_id"), lit(1).as("band_id"), band1.as("band_key")))
          // consumed twice (index build + probe side): materialize the
          // signatures once instead of re-folding the corpus per branch —
          // in production the index IS persisted state, so this is also
          // the honest cost model
          .cutLineage()
        val idx = bands.filter(col("doc_id") % 5 =!= 0)
          .groupBy("band_id", "band_key")
          .agg(min("doc_id").as("first_hist"))
        bands.filter(col("doc_id") % 5 === 0)
          .select("doc_id", "band_id", "band_key")
          .join(idx, Seq("band_id", "band_key"), "left")
          .groupBy("doc_id")
          .agg(count(col("first_hist")).as("n_hit_bands"),
            min(col("first_hist")).as("first_hist_match"))
          .select(col("doc_id"), col("n_hit_bands"), col("first_hist_match"),
            when(col("n_hit_bands") > 0, "near_dup_history")
              .otherwise("new").as("verdict"))
          .orderBy("doc_id")
      }),

    Q(
      "dd_conn_components",
      """Dedup CLUSTER formation — connected components over the union of
        |two similarity edge sets (same normalized token-set key, same
        |winnowing fingerprint): the transitive-closure step between pair
        |generation and canonical-document selection that a real dedup
        |pipeline needs (A~B by content key, B~C by fingerprint => one
        |cluster). Iterative min-label propagation to a fixpoint: each
        |round is a shuffle-on-key join + min-aggregate, labels only
        |decrease, convergence in <= log(diameter) rounds via pointer
        |halving. Edges are STARS: within a key group every member
        |connects to the group's min doc_id (both directions), which has
        |the exact same connectivity as the all-pairs clique but emits
        |2(k-1) edges per k-member group instead of k(k-1) — linear in
        |input even on heavy-tailed duplicate groups. At 100 TB the same
        |loop runs with large-star/small-star alternation and per-round
        |checkpointing; the oracle is the same closure as a recursive
        |CTE.""".stripMargin,
      Some(connComponentsOracle),
      (s, dir) => {
        val (keyed, edges) = connComponentsInput(s, dir)
        val (labels, rounds) =
          graft.ops.ConnectedComponents.run(keyed, edges, "doc_id")
        Console.err.println(s"[dd_conn_components] converged in $rounds rounds")
        keyed.unpersist()
        labels.orderBy("doc_id")
      }),

    Q(
      "dd_conn_components_alt",
      """The same dedup cluster formation run through large-star/small-star
        |ALTERNATION (Kiveris et al., SoCC'14) instead of label
        |propagation — the variant whose per-round state is bounded by the
        |current EDGE count rather than the node count, and whose O(log²
        |n) round bound holds on any graph shape (deep chains included,
        |where plain propagation needs O(log diameter) rounds over a
        |node-sized label table). Same star-edge input, same
        |recursive-CTE closure oracle: both variants must converge to the
        |identical min-doc_id labeling or one of them is wrong.""".stripMargin,
      Some(connComponentsOracle),
      (s, dir) => {
        val (keyed, edges) = connComponentsInput(s, dir)
        val (labels, rounds) =
          graft.ops.ConnectedComponents.alternatingComponents(keyed, edges, "doc_id")
        Console.err.println(s"[dd_conn_components_alt] converged in $rounds rounds")
        keyed.unpersist()
        labels.orderBy("doc_id")
      }),

    Q(
      "dd_simhash",
      """SimHash: 32-bit fingerprint — bit j is the sign of the sum over
        |distinct tokens of ±1 by the top bit of md5 nibble j (hex char >=
        |'8'). Entirely row-local expression folds (no explode, no shuffle);
        |dup-group size via one window over the fingerprint.""".stripMargin,
      Some {
        val toks = "list_distinct(string_split(lower(trim(text)), ' '))"
        val bits = (1 to 32).map(j =>
          s"CASE WHEN list_sum(list_transform($toks, w -> CASE WHEN substr(md5(w), $j, 1) >= '8' THEN 1 ELSE -1 END)) >= 0 THEN '1' ELSE '0' END")
          .mkString(" || ")
        s"""WITH fp AS (SELECT doc_id, ($bits) AS simhash FROM documents)
           |SELECT doc_id, simhash,
           |       COUNT(*) OVER (PARTITION BY simhash) AS n_same
           |FROM fp
           |ORDER BY doc_id""".stripMargin
      },
      (s, dir) => {
        // hash each distinct token ONCE into a materialized column; the 32
        // per-bit folds then read substrings of the precomputed hex — the
        // naive form recomputes md5 per bit (32x the hashing work)
        def bit(j: Int) = when(
          aggregate(col("hashes"), lit(0),
            (acc, h) => acc + when(substring(h, j, 1) >= "8", 1).otherwise(-1)) >= 0,
          "1").otherwise("0")
        val fp = Tables.documents(s, dir)
          .withColumn("hashes", transform(array_distinct(Text.tokens(col("text"))), w => md5(w)))
          .select(col("doc_id"), concat((1 to 32).map(bit): _*).as("simhash"))
        fp.withColumn("n_same", count(lit(1)).over(Window.partitionBy("simhash")))
          .orderBy("doc_id")
      }),

    Q(
      "dd_contamination",
      """Benchmark-contamination check: flag corpus documents sharing any
        |word n-gram with a held-out benchmark set (here the deterministic
        |doc_id % 97 == 0 slice standing in for an eval suite; 3-grams
        |because the synthetic vocabulary is tiny — real corpora use
        |8-13-grams). Per-doc DISTINCT shingles explode scan-side; the
        |benchmark side is distinct'd then BROADCAST (eval suites are
        |small by construction), so the corpus never shuffles. At 100 TB
        |the join key becomes xxhash64(shingle) to shrink the broadcast;
        |the shape is unchanged.""".stripMargin,
      Some(
        """WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
          |           FROM documents),
          |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks)-2),
          |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS s
          |       FROM t WHERE len(toks) >= 3),
          |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
          |SELECT c.doc_id, COUNT(DISTINCT c.s) AS n_shared
          |FROM sh c JOIN bench b ON c.s = b.s
          |WHERE c.doc_id % 97 <> 0
          |GROUP BY 1
          |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val sh = Tables.documents(s, dir)
          .withColumn("toks", Text.tokens(col("text")))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            explode(array_distinct(Text.shinglesOfTokens(col("toks"), 3))).as("s"))
        val bench = sh.filter(col("doc_id") % 97 === 0).select("s").distinct()
        sh.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(bench), "s")
          .groupBy("doc_id")
          .agg(countDistinct(col("s")).as("n_shared"))
          .orderBy("doc_id")
      }),

    Q(
      "dd_lsh_confirm",
      """The composed 100 TB near-dup path the jaccard/minhash docs point
        |to, as one query: LSH band collisions GENERATE candidate pairs
        |(bounded, bucketed — never all-pairs), then each candidate is
        |CONFIRMED by exact Jaccard computed row-locally (hashed sorted
        |sets + native merge-walk intersect). Signatures and confirm both
        |run over 3-word SHINGLES, not unigrams: shingle space is large
        |enough that band collisions mean real similarity (unigram
        |minhash saturates on a bounded vocabulary and collides
        |everything into one bucket — the degenerate case any LSH
        |deployment must block against). The candidate set is
        |collision-sized, so both joins against the per-doc set table
        |broadcast it; the corpus is scanned, never shuffled. Confirm
        |threshold 0.5 = near-dup decision.""".stripMargin,
      Some {
        // seed-hashes derive from the ONCE-computed per-shingle md5 (a
        // fixed 32-char input), not the raw shingle — one long-string
        // hash per shingle total, mirrored exactly in the engine
        val mins = (0 until nSeeds)
          .map(i => s"list_min(list_transform(toks, h -> md5('$i|' || h))) AS h$i")
          .mkString(",\n         ")
        val b0 = (0 until bandSize).map(i => s"h$i").mkString(" || ")
        val b1 = (bandSize until nSeeds).map(i => s"h$i").mkString(" || ")
        s"""WITH w AS (
           |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
           |  FROM documents),
           |tk AS (
           |  SELECT doc_id,
           |         list_distinct(list_transform(
           |           list_transform(range(len(ws) - 2),
           |             i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]),
           |           s -> md5(s))) AS toks
           |  FROM w WHERE len(ws) >= 3),
           |sig AS (
           |  SELECT doc_id,
           |         $mins
           |  FROM tk),
           |bands AS (
           |  SELECT doc_id, 0 AS band_id, md5($b0) AS band_key FROM sig
           |  UNION ALL
           |  SELECT doc_id, 1 AS band_id, md5($b1) AS band_key FROM sig),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |  FROM bands x JOIN bands y
           |    ON x.band_id = y.band_id AND x.band_key = y.band_key
           |   AND x.doc_id < y.doc_id),
           |confirmed AS (
           |  SELECT c.doc_a, c.doc_b,
           |         len(list_filter(ta.toks, t -> list_contains(tb.toks, t))) AS n_inter,
           |         len(ta.toks) AS n_a, len(tb.toks) AS n_b
           |  FROM cand c
           |  JOIN tk ta ON ta.doc_id = c.doc_a
           |  JOIN tk tb ON tb.doc_id = c.doc_b)
           |SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
           |       round(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 6) AS jaccard
           |FROM confirmed
           |WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.5
           |ORDER BY doc_a, doc_b""".stripMargin
      },
      (s, dir) =>
        // implementation shared with DedupPipeline (graft.ops.NearDup) so
        // the end-to-end pipeline runs exactly the oracle-checked operator
        graft.ops.NearDup.confirmedPairs(
          Tables.documents(s, dir), shingleSize = 3,
          nSeeds = nSeeds, bandSize = bandSize, threshold = 0.5)
          .orderBy("doc_a", "doc_b")),

    Q(
      "dd_minhash_est",
      """MinHash sketch CALIBRATION — the tuning pass a dedup deployment
        |runs before trusting its sketch: for every LSH candidate pair
        |(3-shingle signatures, same generator as dd_lsh_confirm), the
        |signature-agreement estimate of Jaccard (matching positions / 8)
        |side-by-side with the exact Jaccard, and the absolute error. All
        |three are integer parts-per-million (n_match*125000 is exact;
        |exact Jaccard is bigint floor division) so the compare has no
        |float ties. Scale shape: signatures and sets are row-local,
        |candidates are collision-sized and broadcast through both joins —
        |the corpus is scanned, never shuffled.""".stripMargin,
      Some {
        val mins = (0 until nSeeds)
          .map(i => s"list_min(list_transform(toks, h -> md5('$i|' || h))) AS h$i")
          .mkString(",\n         ")
        val b0 = (0 until bandSize).map(i => s"h$i").mkString(" || ")
        val b1 = (bandSize until nSeeds).map(i => s"h$i").mkString(" || ")
        val matches = (0 until nSeeds)
          .map(i => s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH w AS (
           |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
           |  FROM documents),
           |tk AS (
           |  SELECT doc_id,
           |         list_distinct(list_transform(
           |           list_transform(range(len(ws) - 2),
           |             i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]),
           |           s -> md5(s))) AS toks
           |  FROM w WHERE len(ws) >= 3),
           |sig AS (
           |  SELECT doc_id,
           |         $mins
           |  FROM tk),
           |bands AS (
           |  SELECT doc_id, 0 AS band_id, md5($b0) AS band_key FROM sig
           |  UNION ALL
           |  SELECT doc_id, 1 AS band_id, md5($b1) AS band_key FROM sig),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |  FROM bands x JOIN bands y
           |    ON x.band_id = y.band_id AND x.band_key = y.band_key
           |   AND x.doc_id < y.doc_id),
           |cmp AS (
           |  SELECT c.doc_a, c.doc_b, $matches AS n_match
           |  FROM cand c
           |  JOIN sig sa ON sa.doc_id = c.doc_a
           |  JOIN sig sb ON sb.doc_id = c.doc_b),
           |ex AS (
           |  SELECT c.doc_a, c.doc_b,
           |         CAST(len(list_filter(ta.toks, t -> list_contains(tb.toks, t))) AS BIGINT) AS n_inter,
           |         CAST(len(ta.toks) AS BIGINT) AS n_a, CAST(len(tb.toks) AS BIGINT) AS n_b
           |  FROM cand c
           |  JOIN tk ta ON ta.doc_id = c.doc_a
           |  JOIN tk tb ON tb.doc_id = c.doc_b)
           |SELECT cmp.doc_a, cmp.doc_b,
           |       CAST(n_match AS BIGINT) AS n_match,
           |       CAST(n_match AS BIGINT) * 125000 AS est_ppm,
           |       (n_inter * 1000000) // (n_a + n_b - n_inter) AS jacc_ppm,
           |       abs(CAST(n_match AS BIGINT) * 125000
           |           - (n_inter * 1000000) // (n_a + n_b - n_inter)) AS err_ppm
           |FROM cmp JOIN ex ON cmp.doc_a = ex.doc_a AND cmp.doc_b = ex.doc_b
           |ORDER BY cmp.doc_a, cmp.doc_b""".stripMargin
      },
      (s, dir) => {
        import org.apache.spark.sql.GraftColumnBridge
        def minHash(seed: Int) =
          array_min(transform(col("toks"), h => md5(concat(lit(s"$seed|"), h)))).as(s"h$seed")
        val base = Tables.documents(s, dir)
          .withColumn("ws", Text.tokens(col("text")))
          .filter(size(col("ws")) >= 3)
          .withColumn("toks", array_distinct(
            transform(Text.shinglesOfTokens(col("ws"), 3), sh => md5(sh))))
          .select("doc_id", "toks")
          .persist()
        // the signature frame feeds FOUR consumers (both band branches +
        // the sa/sb signature-compare sides): persist it so the 8 per-doc
        // minhash folds (8 md5s per shingle) run once, not once per
        // consumer — the same cost-model honesty as the persisted shingle
        // base above (guide §1.2 step 2; unpersisted below after the
        // collision-sized result materializes)
        val sig = base.select(col("doc_id") +: (0 until nSeeds).map(minHash): _*)
          .withColumn("sig", array((0 until nSeeds).map(i => col(s"h$i")): _*))
          .persist()
        val band0 = md5(concat((0 until bandSize).map(i => col(s"h$i")): _*))
        val band1 = md5(concat((bandSize until nSeeds).map(i => col(s"h$i")): _*))
        // both band keys from one cached-sig scan (explode), not a union
        // of two selects — the union form scans (and without the persist,
        // recomputes) sig once per branch
        val bands = sig.select(col("doc_id"), explode(array(
            struct(lit(0).as("band_id"), band0.as("band_key")),
            struct(lit(1).as("band_id"), band1.as("band_key")))).as("b"))
          .select(col("doc_id"), col("b.band_id").as("band_id"),
            col("b.band_key").as("band_key"))
        val cand = bands.as("x")
          .join(bands.as("y"),
            col("x.band_id") === col("y.band_id") &&
              col("x.band_key") === col("y.band_key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val sa = sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
        val sb = sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
        val sets = base.select(col("doc_id"),
          array_sort(transform(col("toks"), t => xxhash64(t))).as("th"))
          .withColumn("n", size(col("th")).cast("long"))
        val ta = sets.select(col("doc_id").as("doc_a"), col("th").as("th_a"), col("n").as("n_a"))
        val tb = sets.select(col("doc_id").as("doc_b"), col("th").as("th_b"), col("n").as("n_b"))
        // candidate-derived side stays the broadcast build through all
        // four joins (the NearDup double-hint pattern)
        val paired = broadcast(broadcast(broadcast(broadcast(cand)
          .join(sa, "doc_a")).join(sb, "doc_b"))
          .join(ta, "doc_a")).join(tb, "doc_b")
          .withColumn("n_match",
            size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
              b => b)).cast("long"))
          .withColumn("n_inter", GraftColumnBridge.column(
            graft.plans.SortedIntersectCountExpression(
              GraftColumnBridge.expression(col("th_a")),
              GraftColumnBridge.expression(col("th_b")))).cast("long"))
        val out = paired
          .withColumn("est_ppm", col("n_match") * 125000L)
          .withColumn("jacc_ppm",
            expr("(n_inter * 1000000) div (n_a + n_b - n_inter)"))
          .select(col("doc_a"), col("doc_b"), col("n_match"), col("est_ppm"),
            col("jacc_ppm"), abs(col("est_ppm") - col("jacc_ppm")).as("err_ppm"))
          .orderBy("doc_a", "doc_b")
          .cutLineage(true)
        base.unpersist()
        sig.unpersist()
        out
      }),

    Q(
      "dd_pipeline_keepers",
      """The WHOLE dedup pipeline oracle-checked end-to-end
        |(graft.pipelines.DedupPipeline): exact-duplicate star edges
        |(normalized content key) unioned with LSH-candidate →
        |exact-confirm near-dup pairs (Jaccard >= 0.5 over 3-word
        |shingles), connected components over the union, min-doc_id
        |canonical keeper per cluster. Output: every document with its
        |keeper and whether it survives — the J5-exactly-once + A1-style
        |canonical-pick composition. The oracle recomputes the same
        |closure as a recursive CTE over clique-form edges (identical
        |connectivity to the engine's linear star form).""".stripMargin,
      Some {
        val mins = (0 until nSeeds)
          .map(i => s"list_min(list_transform(toks, h -> md5('$i|' || h))) AS h$i")
          .mkString(",\n         ")
        val b0 = (0 until bandSize).map(i => s"h$i").mkString(" || ")
        val b1 = (bandSize until nSeeds).map(i => s"h$i").mkString(" || ")
        s"""WITH w AS (
           |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws
           |  FROM documents),
           |keyed AS (
           |  SELECT doc_id,
           |         md5(array_to_string(list_sort(list_distinct(ws)), ' ')) AS norm_key
           |  FROM w),
           |tk AS (
           |  SELECT doc_id,
           |         list_distinct(list_transform(
           |           list_transform(range(len(ws) - 2),
           |             i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]),
           |           s -> md5(s))) AS toks
           |  FROM w WHERE len(ws) >= 3),
           |sig AS (
           |  SELECT doc_id,
           |         $mins
           |  FROM tk),
           |bands AS (
           |  SELECT doc_id, 0 AS band_id, md5($b0) AS band_key FROM sig
           |  UNION ALL
           |  SELECT doc_id, 1 AS band_id, md5($b1) AS band_key FROM sig),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |  FROM bands x JOIN bands y
           |    ON x.band_id = y.band_id AND x.band_key = y.band_key
           |   AND x.doc_id < y.doc_id),
           |conf AS (
           |  SELECT c.doc_a, c.doc_b
           |  FROM cand c
           |  JOIN tk ta ON ta.doc_id = c.doc_a
           |  JOIN tk tb ON tb.doc_id = c.doc_b
           |  WHERE CAST(len(list_filter(ta.toks, t -> list_contains(tb.toks, t))) AS DOUBLE)
           |        / (len(ta.toks) + len(tb.toks)
           |           - len(list_filter(ta.toks, t -> list_contains(tb.toks, t)))) >= 0.5),
           |e1 AS (
           |  SELECT a.doc_id AS src, b.doc_id AS dst FROM keyed a JOIN keyed b
           |  ON a.norm_key = b.norm_key AND a.doc_id <> b.doc_id),
           |e2 AS (
           |  SELECT doc_a AS src, doc_b AS dst FROM conf
           |  UNION ALL
           |  SELECT doc_b AS src, doc_a AS dst FROM conf),
           |edges AS (SELECT * FROM e1 UNION SELECT * FROM e2),
           |reach AS (
           |  WITH RECURSIVE r(a, b) AS (
           |    SELECT doc_id, doc_id FROM keyed
           |    UNION
           |    SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
           |  ) SELECT * FROM r)
           |SELECT a AS doc_id, MIN(b) AS keeper, (a = MIN(b)) AS is_keeper
           |FROM reach
           |GROUP BY a
           |ORDER BY doc_id""".stripMargin
      },
      (s, dir) =>
        graft.pipelines.DedupPipeline.assignments(Tables.documents(s, dir))
          .orderBy("doc_id")),

    Q(
      "dd_incremental",
      """Incremental dedup: a new crawl batch (the deterministic doc_id %
        |5 == 0 slice) deduped against the historical corpus (the rest)
        |by normalized content key — the daily-ingest shape where history
        |is a persisted key index, not a rescan. Verdict per incoming doc:
        |dup_history (key already indexed), dup_batch (key repeats inside
        |the batch; first doc_id wins), new. The history side is
        |key-sized, not corpus-sized, and the join shuffles ONLY on the
        |key column; at scale the index lives bucketed-by-key (see
        |BucketedJoinSpec) so only the small incoming batch moves —
        |cross-run persistence of the index is the DispatchState
        |versioned-snapshot pattern.""".stripMargin,
      Some(
        """WITH k AS (
          |  SELECT doc_id,
          |         md5(array_to_string(list_sort(list_distinct(
          |           string_split(lower(trim(text)), ' '))), ' ')) AS norm_key
          |  FROM documents),
          |hist AS (SELECT DISTINCT norm_key FROM k WHERE doc_id % 5 <> 0),
          |inc AS (SELECT doc_id, norm_key FROM k WHERE doc_id % 5 = 0),
          |firsts AS (SELECT norm_key, MIN(doc_id) AS first_id FROM inc GROUP BY 1)
          |SELECT i.doc_id, i.norm_key,
          |       CASE WHEN h.norm_key IS NOT NULL THEN 'dup_history'
          |            WHEN i.doc_id <> f.first_id THEN 'dup_batch'
          |            ELSE 'new' END AS verdict
          |FROM inc i
          |LEFT JOIN hist h ON i.norm_key = h.norm_key
          |JOIN firsts f ON i.norm_key = f.norm_key
          |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val k = Tables.documents(s, dir)
          .select(col("doc_id"), Text.normalizedKey(col("text")).as("norm_key"))
        val hist = k.filter(col("doc_id") % 5 =!= 0)
          .select("norm_key").distinct()
          .withColumn("in_hist", lit(true))
        val inc = k.filter(col("doc_id") % 5 === 0)
        inc
          .withColumn("first_id",
            min("doc_id").over(Window.partitionBy("norm_key")))
          .join(hist, Seq("norm_key"), "left")
          .select(
            col("doc_id"), col("norm_key"),
            when(col("in_hist"), "dup_history")
              .when(col("doc_id") =!= col("first_id"), "dup_batch")
              .otherwise("new").as("verdict"))
          .orderBy("doc_id")
      }),

    Q(
      "dd_substring_spans",
      """Exact n-gram span dedup (the substring-level pass of Lee et al.
        |2022, "Deduplicating Training Data Makes Language Models
        |Better"): every 8-token window is hashed, windows whose hash
        |occurs in >= 2 DISTINCT documents are duplicated spans, and each
        |document reports how much of it is covered by cross-document
        |repetition (total windows, duplicated windows, distinct
        |duplicated 8-grams, first duplicated offset).
        |
        |Scale shape: the window fan-out is generated at the scan
        |(sequence+transform over a materialized token array — zero
        |shuffle); the first aggregate keys on (hash, doc) with map-side
        |partials, so the shuffle carries distinct window-hash pairs, not
        |token positions; doc-frequency is then a count window over the
        |already-aggregated pair frame (one hash-key shuffle); the final
        |per-doc rollup is a third key-sized aggregate. No self-join, no
        |corpus rescan — the three shuffles are all bounded by distinct
        |(hash, doc) cardinality.""".stripMargin,
      Some(
        """WITH t AS (
          |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
          |  FROM documents
          |  WHERE text IS NOT NULL
          |    AND len(string_split(lower(trim(text)), ' ')) >= 8),
          |w AS (
          |  SELECT doc_id, CAST(i AS BIGINT) AS start,
          |         md5(concat_ws(' ', toks[i+1], toks[i+2], toks[i+3],
          |                            toks[i+4], toks[i+5], toks[i+6],
          |                            toks[i+7], toks[i+8])) AS h
          |  FROM t, LATERAL (SELECT unnest(range(len(toks) - 7)) AS i)),
          |d AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY h)
          |SELECT w.doc_id,
          |       CAST(COUNT(*) AS BIGINT) AS n_windows,
          |       CAST(COUNT(*) FILTER (WHERE nd >= 2) AS BIGINT) AS dup_windows,
          |       CAST(COUNT(DISTINCT w.h) FILTER (WHERE nd >= 2) AS BIGINT) AS dup_ngrams,
          |       MIN(start) FILTER (WHERE nd >= 2) AS first_dup_start
          |FROM w JOIN d ON w.h = d.h
          |GROUP BY w.doc_id
          |ORDER BY w.doc_id""".stripMargin),
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .withColumn("toks", Text.tokens(col("text")))
          .filter(col("text").isNotNull && size(col("toks")) >= 8)
          .select(col("doc_id"), col("toks"))
        val w = t
          .select(col("doc_id"),
            posexplode(transform(Text.shinglesOfTokens(col("toks"), 8),
              sh => md5(sh))))
          .select(col("doc_id"), col("pos").cast("bigint").as("start"),
            col("col").as("h"))
        // (hash, doc) pairs first — dedups positions map-side; the count
        // window over that frame IS the distinct-doc frequency (the frame
        // is unique on (h, doc)), replacing the oracle's w JOIN d rescan
        val pairs = w.groupBy("h", "doc_id")
          .agg(count(lit(1)).as("c"), min("start").as("mn"))
          .withColumn("nd", count(lit(1)).over(Window.partitionBy("h")))
        pairs.groupBy("doc_id")
          .agg(
            sum("c").as("n_windows"),
            sum(when(col("nd") >= 2, col("c")).otherwise(lit(0L))).as("dup_windows"),
            count(when(col("nd") >= 2, true)).as("dup_ngrams"),
            min(when(col("nd") >= 2, col("mn"))).as("first_dup_start"))
          .orderBy("doc_id")
      }),

    Q(
      "dd_prefix_filter_join",
      """EXACT set-similarity self-join via prefix filtering (AllPairs /
        |PPJoin — Bayardo et al. WWW'07, Xiao et al. WWW'08): the
        |literature's other candidate-generation strategy beside
        |MinHash banding, and unlike banding it is EXACT — zero false
        |negatives by construction, and it needs no blocking key. Each
        |doc's distinct 3-shingle set is ordered by GLOBAL ascending
        |document frequency (rarest first, ties by token); for Jaccard
        |>= 1/2 any qualifying pair must share a token within each
        |side's first n - ceil(n/2) + 1 tokens (overlap bound: J >= t
        |implies |A cap B| >= t*|A|), so candidates = pairs sharing a
        |PREFIX token. Confirm is the same row-local native merge-walk
        |intersect as dd_ngram_jaccard, threshold as the integer
        |cross-product 3*inter >= |A|+|B|.
        |
        |The oracle is the PLAIN unblocked pairwise Jaccard — so the
        |hash match IS the proof of the no-false-negative guarantee.
        |Scale shape: frequency ordering makes every prefix token one of
        |its document's rarest, so posting lists in the candidate join
        |are short by construction (the quadratic term is bounded by
        |rare-token frequency squared, the algorithm's whole point);
        |the per-doc ranking window is doc-partitioned; the confirm
        |joins carry no broadcast hint — AQE picks, and past any
        |broadcast ceiling they degrade to shuffle joins instead of
        |dying.""".stripMargin,
      Some(
        """WITH sh AS (
          |  SELECT DISTINCT doc_id, unnest(list_transform(
          |    range(len(string_split(lower(trim(text)), ' ')) - 2),
          |    i -> concat_ws(' ',
          |           string_split(lower(trim(text)), ' ')[i+1],
          |           string_split(lower(trim(text)), ' ')[i+2],
          |           string_split(lower(trim(text)), ' ')[i+3]))) AS shingle
          |  FROM documents
          |  WHERE len(string_split(lower(trim(text)), ' ')) >= 3),
          |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
          |  FROM sh a JOIN sh b
          |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT doc_a, doc_b, n_inter,
          |       round(CAST(n_inter AS DOUBLE)
          |             / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
          |FROM inter
          |JOIN sizes sa ON sa.doc_id = doc_a
          |JOIN sizes sb ON sb.doc_id = doc_b
          |WHERE 3 * n_inter >= sa.n_sh + sb.n_sh
          |ORDER BY doc_a, doc_b""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.GraftColumnBridge
        import org.apache.spark.sql.expressions.Window
        // materialized ONCE (3 consumers: token explode + both confirm
        // sides) — without the checkpoint each self-join branch re-scans
        // and re-shingles the corpus
        val sets = Tables.documents(s, dir)
          .withColumn("toks", Text.tokens(col("text")))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            array_sort(array_distinct(
              transform(Text.shinglesOfTokens(col("toks"), 3),
                sh => xxhash64(sh)))).as("sh"))
          .withColumn("n_sh", size(col("sh")).cast("long"))
          .cutLineage()
        // global document frequency per shingle hash -> rarest-first rank
        val toks = sets.select(col("doc_id"), col("n_sh"),
          explode(col("sh")).as("tok"))
        val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("dfreq"))
        // prefix length n - ceil(n/2) + 1 in pure integers; the rank
        // window is doc-partitioned (never global)
        val pref = toks.join(dfreq, "tok")
          .withColumn("rk", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("dfreq"), col("tok"))))
          .filter(col("rk") <= expr("n_sh - ((n_sh + 1) div 2) + 1"))
          .select(col("tok"), col("doc_id"))
          .cutLineage() // both sides of the candidate self-join
        val cand = pref.select(col("tok"), col("doc_id").as("doc_a"))
          .join(pref.select(col("tok"), col("doc_id").as("doc_b")), Seq("tok"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        // confirm: deliberately hint-free (contrast NearDup's sized hint)
        val confirmed = cand
          .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
            col("n_sh").as("n_a")), Seq("doc_a"))
          .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
            col("n_sh").as("n_b")), Seq("doc_b"))
          .withColumn("n_inter", GraftColumnBridge.column(
            graft.plans.SortedIntersectCountExpression(
              GraftColumnBridge.expression(col("sh_a")),
              GraftColumnBridge.expression(col("sh_b")))))
          .filter(col("n_inter") * 3 >= col("n_a") + col("n_b"))
        confirmed
          .select(col("doc_a"), col("doc_b"), col("n_inter"),
            round(col("n_inter").cast("double")
              / (col("n_a") + col("n_b") - col("n_inter")), 6).as("jaccard"))
          .orderBy("doc_a", "doc_b")
      }),

    Q(
      "dd_symspell_neighbors",
      """Edit-distance-1 neighbor discovery via SYMMETRIC-DELETE
        |(SymSpell) blocking — the candidate generator that makes fuzzy
        |dedup linear instead of all-pairs: two strings are within one
        |edit (insert/delete/substitute) iff they share a member of
        |their deletion neighborhoods (each string plus its
        |length-many single-character deletions), so candidates come
        |from ONE equi-join on the variant key and the exact
        |Levenshtein confirm runs only on collisions. Names collapse
        |to DISTINCT strings first (the exact-dup pre-collapse every
        |scalable fuzzy pass starts with — replica copies reuse names,
        |so this also pins output size to the NAME domain, not the row
        |count). Per distinct supplier name: member count, distinct
        |names at edit distance exactly 1, and the nearest such name
        |(lexicographic min — deterministic). Variant lists are
        |deduplicated per name (repeated characters collapse), so the
        |pair set needs no multiplicity correction — just DISTINCT on
        |the colliding pair.""".stripMargin,
      Some(
        """WITH nm AS (
          |  SELECT s_name AS name, CAST(COUNT(*) AS BIGINT) AS members,
          |         CAST(MIN(s_suppkey) AS BIGINT) AS min_key
          |  FROM supplier GROUP BY 1),
          |vr AS (
          |  SELECT name, unnest(list_distinct(list_transform(
          |           range(0, length(name) + 1),
          |           i -> substr(name, 1, CAST(i AS INT))
          |                || substr(name, CAST(i AS INT) + 2)))) AS v
          |  FROM nm),
          |cand AS (
          |  SELECT DISTINCT a.name AS name_a, b.name AS name_b
          |  FROM vr a JOIN vr b ON a.v = b.v AND a.name <> b.name),
          |nb AS (
          |  SELECT name_a, name_b FROM cand
          |  WHERE levenshtein(name_a, name_b) = 1)
          |SELECT nm.name, nm.members, nm.min_key,
          |       CAST(COALESCE(COUNT(nb.name_b), 0) AS BIGINT) AS n_near,
          |       MIN(nb.name_b) AS nearest
          |FROM nm LEFT JOIN nb ON nb.name_a = nm.name
          |GROUP BY nm.name, nm.members, nm.min_key
          |ORDER BY nm.name""".stripMargin),
      (s, dir) => {
        val nm = Tables.supplier(s, dir)
          .groupBy(col("s_name").as("name"))
          .agg(count(lit(1)).as("members"),
            min("s_suppkey").cast("long").as("min_key"))
        val vr = nm.select(col("name"),
          explode(array_distinct(expr(
            """transform(sequence(0, length(name)),
              |i -> concat(substring(name, 1, i), substring(name, i + 2)))"""
              .stripMargin))).as("v"))
        val cand = vr.as("a")
          .join(vr.as("b"),
            col("a.v") === col("b.v") && col("a.name") =!= col("b.name"))
          .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
          .distinct()
        val nb = cand.filter(levenshtein(col("name_a"), col("name_b")) === 1)
        nm.join(nb, nm("name") === nb("name_a"), "left")
          .groupBy(nm("name"), col("members"), col("min_key"))
          .agg(count(col("name_b")).as("n_near"),
            min(col("name_b")).as("nearest"))
          .select(col("name"), col("members"), col("min_key"),
            col("n_near"), col("nearest"))
          .orderBy("name")
      }),

    Q(
      "dd_sorted_neighborhood",
      """Sorted-Neighborhood blocking (Hernandez & Stolfo 1995) — the
        |third classic ER candidate generator next to LSH banding
        |(dd_minhash_lsh) and symmetric-delete (dd_symspell_neighbors):
        |sort by the blocking key, slide a window of 3, and only
        |rank-adjacent records pair up — candidates are 2 per record by
        |CONSTRUCTION (w-1 per record at window w), the tightest
        |candidate bound any blocking scheme gives. Customer names
        |collapse to the DISTINCT name domain first (replica copies
        |reuse names, so the sort frame is name-domain-sized — scale-
        |invariant — and exact duplicates are handled by the collapse,
        |not the window). The rank walk is a global row_number over
        |that collapsed frame; at a true corpus-sized key domain the
        |same pairing runs on range-partitioned sorted runs with a
        |(w-1)-row halo exchanged at partition boundaries — rank
        |adjacency is partitioning-independent, which is why SNM
        |distributes where fixed-width blocking does not. Candidates
        |confirm with exact Levenshtein <= 2.""".stripMargin,
      Some(
        """WITH nm AS (
          |  SELECT c_name AS name, CAST(COUNT(*) AS BIGINT) AS members
          |  FROM customer GROUP BY 1),
          |rk AS (
          |  SELECT name, members,
          |         ROW_NUMBER() OVER (ORDER BY name) AS r
          |  FROM nm),
          |cand AS (
          |  SELECT a.name AS name_a, b.name AS name_b,
          |         CAST(b.r - a.r AS BIGINT) AS gap
          |  FROM rk a JOIN rk b ON b.r = a.r + 1 OR b.r = a.r + 2),
          |-- edit distance computed ONCE and filtered on the named
          |-- column, mirroring the Spark shape (it used to run twice
          |-- per candidate: once in SELECT, once in WHERE)
          |scored AS (
          |  SELECT name_a, name_b, gap,
          |         CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
          |  FROM cand)
          |SELECT name_a, name_b, gap, dist
          |FROM scored
          |WHERE dist <= 2
          |ORDER BY name_a, name_b""".stripMargin),
      (s, dir) => {
        val nm = Tables.customer(s, dir)
          .groupBy(col("c_name").as("name"))
          .agg(count(lit(1)).as("members"))
        val rk = nm.withColumn("r",
          row_number().over(Window.orderBy("name")).cast("long"))
        val a = rk.select(col("name").as("name_a"), col("r").as("ra"))
        val b = rk.select(col("name").as("name_b"), col("r").as("rb"))
        // two equi joins (rank+1, rank+2) instead of one OR-join: OR
        // predicates defeat hash-join key extraction and plan a
        // nested loop
        val cand = a.join(b, col("rb") === col("ra") + 1)
          .unionAll(a.join(b, col("rb") === col("ra") + 2))
          .select(col("name_a"), col("name_b"),
            (col("rb") - col("ra")).as("gap"))
        cand
          .withColumn("dist",
            levenshtein(col("name_a"), col("name_b")).cast("long"))
          .filter(col("dist") <= 2)
          .select(col("name_a"), col("name_b"), col("gap"), col("dist"))
          .orderBy("name_a", "name_b")
      }))
}
