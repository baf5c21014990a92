package graft.ops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Multimodal plumbing: synthesized binary assets, typed mapPartitions
  * codec stages (PNG/WAV/GIF, all real JDK codecs), expression-side media
  * stats. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("phash: brightness-shifted near-dups collapse; exact dedup would find nothing") {
    val assets = Multimodal.synthesizeNearDupPngs(
      Tables.documents(spark, sfSmoke).limit(200).select("doc_id"))
    val ph = Multimodal.decodePhash(assets).toDF().cache()
    try {
      // every fingerprint group is exactly one duplicate class, and the
      // classes genuinely collapse (multiple docs per group)
      val groups = ph
        .groupBy("phash", "img_w", "img_h")
        .agg(countDistinct(expr("media_id % 37")).as("n_cls"),
          count(lit(1)).as("n_docs"))
        .collect()
      assert(groups.forall(_.getAs[Long]("n_cls") === 1L),
        "a fingerprint group mixed duplicate classes")
      assert(groups.exists(_.getAs[Long]("n_docs") > 1L),
        "no class collapsed — the near-dup synthesis is broken")
      // the invariance claim is real: within a class the BLOBS differ
      // (brightness offsets), so byte-level dedup cannot group them
      val blobDistinct = assets.toDF()
        .withColumn("cls", expr("media_id % 37"))
        .withColumn("off", expr("media_id % 23"))
        .groupBy("cls")
        .agg(countDistinct(md5(col("blob"))).as("n_blobs"),
          countDistinct(col("off")).as("n_offs"))
        .collect()
      blobDistinct.foreach { r =>
        assert(r.getAs[Long]("n_blobs") === r.getAs[Long]("n_offs"),
          s"class ${r.get(0)}: distinct offsets must give distinct blobs")
      }
      assert(blobDistinct.exists(_.getAs[Long]("n_blobs") > 1L),
        "every class rendered one blob — exact dedup would already work")
    } finally ph.unpersist()
  }

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

  test("GIF round trip: blobs are real multi-frame GIFs and every frame decodes exactly") {
    val gifs = Multimodal.synthesizeGifs(
      Tables.documents(spark, sfSmoke).limit(60)).cache()
    // real GIF magic: these are encoded animations, not byte stand-ins
    assert(gifs.collect().forall(g =>
      g.blob.take(6).sameElements("GIF89a".getBytes) ||
        g.blob.take(6).sameElements("GIF87a".getBytes)))
    val byAsset = Multimodal.decodeGifFrames(gifs).collect().groupBy(_.media_id)
    byAsset.foreach { case (id, fs) =>
      val w = 5 + (id % 4).toInt; val h = 5 + (id % 3).toInt
      assert(fs.length === 2 + (id % 4).toInt, s"frame count for $id")
      assert(fs.map(_.frame_idx).sorted.toSeq === (0 until fs.length))
      fs.foreach { f =>
        assert(f.f_w === w && f.f_h === h)
        val expect = (0 until w * h).map(i => (id * 13 + f.frame_idx * 7 + i * 3) % 256).sum
        assert(f.px_sum === expect, s"pixel sum for ($id, ${f.frame_idx})")
      }
    }
    gifs.unpersist()
  }

  test("resizeImageStats: Graphics2D 2x downscale matches the pixel-center closed form") {
    val pngs = Multimodal.synthesizePngs2x(
      Tables.documents(spark, sfSmoke).limit(60)).cache()
    val bad = Multimodal.resizeImageStats(pngs).map { r =>
      val id = r.media_id
      val ow = 2 + (id % 4).toInt; val oh = 2 + (id % 3).toInt
      val sw = 2 * ow
      // NN at exact 2x picks src(2x+1, 2y+1) on every Java2D path
      val expect = 3L * (for (y <- 0 until oh; x <- 0 until ow)
        yield (id * 31 + (2 * y + 1) * sw + 2 * x + 1) % 256).sum
      (r.out_w == ow) && (r.out_h == oh) && (r.px_sum == expect)
    }.filter(ok => !ok).count()
    assert(bad === 0)
    pngs.unpersist()
  }

  test("decodeGifFrames fails loudly on an undecodable blob") {
    val junk = Seq(Multimodal.GifAsset(1L, Array[Byte](7, 7, 7))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeGifFrames(junk).collect()
    }
    assert(e.getMessage != null)
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

  test("frameManifest invariants: stride-aligned offsets, in-bounds windows, exact digests") {
    val docs = Tables.documents(spark, sfSmoke)
    val media = Multimodal.synthesize(docs)
    val manifest = Multimodal.frameManifest(media, window = 16, stride = 32)
    val joined = manifest.join(docs, manifest("media_id") === col("doc_id"))
    // offsets are exactly frame_id*stride and every window starts in-blob
    assert(joined.filter(col("byte_off") =!= col("frame_id") * 32).count() === 0)
    assert(joined.filter(col("byte_off") + 16 > length(col("text"))
      && col("byte_off") >= length(col("text"))).count() === 0)
    // digest equals md5 of the exact byte slice, and frame counts per
    // asset equal the closed-form floor((len-16)/32)+1
    assert(joined.filter(col("frame_digest") =!=
      md5(col("text").substr((col("frame_id") * 32 + 1).cast("int"), lit(16)))).count() === 0)
    val counts = manifest.groupBy("media_id").count()
      .join(docs, col("media_id") === col("doc_id"))
      .filter(col("count") =!= (floor((length(col("text")) - 16) / 32) + 1))
    assert(counts.count() === 0)
  }

  test("PNG round trip: blobs are real PNGs and decode recovers the exact pixels") {
    import spark.implicits._
    val pngs = Multimodal.synthesizePngs(
      Tables.documents(spark, sfSmoke).limit(50)).cache()
    // the blobs carry the real PNG magic — these are encoded images, not
    // byte stand-ins
    val magic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    assert(pngs.collect().forall(_.blob.take(4).sameElements(magic)))
    // decode recovers dimensions and the exact channel sum predicted by
    // the closed-form pixel function
    val bad = Multimodal.decodeImageStats(pngs).map { d =>
      val id = d.media_id
      val w = 1 + (id % 8).toInt; val h = 1 + (id % 5).toInt
      val expect = 3L * (0 until w * h).map(i => (id * 31 + i) % 256).sum
      (d.img_w == w) && (d.img_h == h) && (d.px_sum == expect)
    }.filter(ok => !ok).count()
    assert(bad === 0)
    pngs.unpersist()
  }

  test("WAV round trip: blobs are real RIFF/WAVE containers and decode recovers the samples") {
    import spark.implicits._
    val wavs = Multimodal.synthesizeWavs(
      Tables.documents(spark, sfSmoke).limit(50)).cache()
    // real WAV magic: RIFF....WAVE
    assert(wavs.collect().forall { w =>
      w.blob.take(4).sameElements("RIFF".getBytes) &&
        w.blob.slice(8, 12).sameElements("WAVE".getBytes)
    })
    val bad = Multimodal.decodeWavStats(wavs).map { d =>
      val id = d.media_id
      val n = (100 + id % 200).toInt
      val expect = (0 until n).map(i => (id * 7 + i * 13) % 256).sum
      (d.sample_rate == 8000) && (d.n_samples == n) && (d.amp_sum == expect)
    }.filter(ok => !ok).count()
    assert(bad === 0)
    wavs.unpersist()
  }

  test("decodeWavStats fails loudly on an undecodable blob") {
    import spark.implicits._
    val junk = Seq(Multimodal.WavAsset(1L, Array[Byte](9, 9, 9))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWavStats(junk).collect()
    }
    assert(e.getMessage != null)
  }

  test("decodeImageStats fails loudly on an undecodable blob") {
    import spark.implicits._
    val junk = Seq(Multimodal.PngAsset(1L, Array[Byte](1, 2, 3))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImageStats(junk).collect()
    }
    assert(e.getMessage != null)
  }
}
