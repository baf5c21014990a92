package graft.pipelines

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation: quality gate -> exact dedup ->
  * deterministic split -> sequence packing, with the funnel reconciling
  * and every stage's invariant checked on the one manifest. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfSmoke)
  private lazy val manifest = CorpusPipeline.prepare(docs).persist()

  test("funnel reconciles: raw >= kept = train+val+test, all splits non-trivial") {
    val f = CorpusPipeline.funnel(docs, manifest)
    assert(f.raw >= f.kept && f.kept > 0)
    assert(f.train + f.`val` + f.test === f.kept)
    assert(f.train > f.`val` && f.train > f.test) // ~85/10/5 by construction
  }

  test("dedup: no two kept docs share a normalized content key") {
    val kept = manifest.select("doc_id")
    val keys = docs.join(kept, "doc_id")
      .select(graft.functions.Text.normalizedKey(col("text")).as("k"))
    assert(keys.count() === keys.distinct().count())
  }

  test("packing: bins are contiguous from 0 and token-bounded per (split, source)") {
    val cfg = CorpusPipeline.Config()
    val perBin = manifest.groupBy("split", "source", "bin")
      .agg(sum("n_tokens").as("toks"), max("n_tokens").as("maxdoc"))
      .collect()
    perBin.foreach { r =>
      val toks = r.getLong(3)
      val maxdoc = r.getInt(4).toLong
      // concat-and-chunk: a bin never exceeds ctx + one straddling doc
      assert(toks <= cfg.ctxTokens + maxdoc,
        s"bin ${r.getString(0)}/${r.getString(1)}/${r.getLong(2)} overflows: $toks")
    }
    // bins start at 0 and are contiguous within each (split, source)
    manifest.groupBy("split", "source")
      .agg(min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("n"))
      .collect().foreach { r =>
        assert(r.getLong(2) === 0L)
        assert(r.getLong(4) === r.getLong(3) + 1)
      }
  }

  test("deterministic: a second run builds the identical manifest") {
    val again = CorpusPipeline.prepare(docs)
    assert(manifest.exceptAll(again).count() === 0)
    assert(again.exceptAll(manifest).count() === 0)
  }
}
