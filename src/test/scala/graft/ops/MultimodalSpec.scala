package graft.ops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Multimodal plumbing: synthesized binary assets, typed mapPartitions
  * feature extraction (stub decoder), expression-side media stats. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthesize + extractFeatures: schema, determinism, histogram sanity") {
    val media = Multimodal.synthesize(Tables.documents(spark, sfSmoke))
    val ds = media.selectExpr("media_id", "kind", "blob", "width", "sample_rate", "n_frames")
      .as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(ds)
    val rows = feats.collect()
    assert(rows.length === media.count())
    // deterministic across runs
    val again = Multimodal.extractFeatures(ds).collect()
    assert(rows.map(_.media_id).toSeq === again.map(_.media_id).toSeq)
    rows.foreach { r =>
      assert(r.feature.length === 16)
      assert(math.abs(r.feature.sum - 1.0) < 1e-9, s"histogram of ${r.media_id} not normalized")
      assert(Set("image", "audio", "video").contains(r.kind))
      assert(r.n_bytes > 0 && r.mean_byte > 0)
    }
  }

  test("mediaStats frame digests match direct byte-slice hashing") {
    val media = Multimodal.synthesize(Tables.documents(spark, sfSmoke))
    val stats = Multimodal.mediaStats(media, frameLen = 16, nFrames = 3)
    val joined = stats.join(Tables.documents(spark, sfSmoke),
      stats("media_id") === col("doc_id"))
    val bad = joined.filter(
      col("digest") =!= md5(col("text")) ||
        col("frame_0") =!= md5(substring(col("text"), 1, 16))).count()
    assert(bad === 0)
  }
}
