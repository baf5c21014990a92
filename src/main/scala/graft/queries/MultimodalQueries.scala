package graft.queries

import graft.ops.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Multimodal queries: expression-side stats, the frame-sampling manifest,
  * and a REAL image decode — PNG encode (`javax.imageio`) on one side,
  * `ImageIO.read` on the other, with a closed-form pixel function so the
  * SQL oracle can predict the decoded output exactly.
  */
object MultimodalQueries {
  val qs: Seq[Q] = Seq(
    Q(
      "mm_decode_stats",
      """Real image decode, oracle-checked: assets are ACTUAL PNGs encoded
        |executor-side with javax.imageio from a closed-form pixel function
        |of doc_id (gray (doc_id*31+i) mod 256 over row-major pixel index
        |i, width 1+id%8, height 1+id%5); the query ImageIO-decodes each
        |blob back in batched mapPartitions and emits true width/height and
        |the exact channel-value sum. The oracle computes the same stats
        |arithmetically, never touching an image library — equality proves
        |the encode->decode round trip is pixel-faithful. Partition-local
        |both sides: no shuffle at any corpus size.""".stripMargin,
      Some(
        """SELECT doc_id AS media_id,
          |       CAST(1 + doc_id % 8 AS INT) AS img_w,
          |       CAST(1 + doc_id % 5 AS INT) AS img_h,
          |       CAST(3 * list_sum(list_transform(
          |              range((1 + doc_id % 8) * (1 + doc_id % 5)),
          |              i -> (doc_id * 31 + i) % 256)) AS BIGINT) AS px_sum
          |FROM documents
          |ORDER BY media_id""".stripMargin),
      (s, dir) =>
        Multimodal.decodeImageStats(
          Multimodal.synthesizePngs(Tables.documents(s, dir)))
          .toDF().orderBy("media_id")),

    Q(
      "mm_audio_decode",
      """Real audio decode, oracle-checked — the audio twin of
        |mm_decode_stats: assets are ACTUAL WAV containers encoded
        |executor-side with javax.sound.sampled (8-bit unsigned PCM mono,
        |8 kHz; sample i = (doc_id*7 + i*13) mod 256 over 100 + doc_id%200
        |frames); the query AudioSystem-decodes each blob in batched
        |mapPartitions and emits the container's true sample rate, frame
        |count, and exact amplitude sum. The oracle computes the same
        |stats arithmetically, never touching an audio library — equality
        |proves the encode->decode round trip is sample-faithful.
        |Partition-local both sides: no shuffle at any corpus size.""".stripMargin,
      Some(
        """SELECT doc_id AS media_id,
          |       8000 AS sample_rate,
          |       CAST(100 + doc_id % 200 AS BIGINT) AS n_samples,
          |       CAST(list_sum(list_transform(
          |              range(CAST(100 + doc_id % 200 AS INT)),
          |              i -> (doc_id * 7 + i * 13) % 256)) AS BIGINT) AS amp_sum
          |FROM documents
          |ORDER BY media_id""".stripMargin),
      (s, dir) =>
        Multimodal.decodeWavStats(
          Multimodal.synthesizeWavs(Tables.documents(s, dir)))
          .toDF().orderBy("media_id")),

    Q(
      "mm_video_frames",
      """Real multi-frame VIDEO decode, oracle-checked: assets are ACTUAL
        |animated GIFs encoded executor-side with the JDK's javax.imageio
        |GIF writer (the one multi-frame container the JDK both encodes
        |and decodes) from a closed-form pixel function — frame f, pixel
        |i: gray (doc_id*13 + f*7 + i*3) mod 256 over w=5+id%4, h=5+id%3,
        |2+id%4 frames. The query GIF-decodes every frame back in batched
        |mapPartitions (one reader per partition) and emits one row per
        |frame with true dimensions and the exact gray-value sum; the
        |oracle computes the same stats arithmetically, never touching an
        |image library — equality proves the multi-frame encode->decode
        |round trip is pixel-faithful. Generator fan-out at the decode
        |(rows multiply by frames-per-asset), partition-local both sides:
        |no shuffle at any corpus size.""".stripMargin,
      Some(
        """WITH f AS (
          |  SELECT doc_id AS media_id,
          |         unnest(range(2 + doc_id % 4)) AS frame_idx
          |  FROM documents)
          |SELECT media_id,
          |       CAST(frame_idx AS INT) AS frame_idx,
          |       CAST(5 + media_id % 4 AS INT) AS f_w,
          |       CAST(5 + media_id % 3 AS INT) AS f_h,
          |       CAST(list_sum(list_transform(
          |              range((5 + media_id % 4) * (5 + media_id % 3)),
          |              i -> (media_id * 13 + frame_idx * 7 + i * 3) % 256))
          |            AS BIGINT) AS px_sum
          |FROM f
          |ORDER BY media_id, frame_idx""".stripMargin),
      (s, dir) =>
        Multimodal.decodeGifFrames(
          Multimodal.synthesizeGifs(Tables.documents(s, dir)))
          .toDF().orderBy("media_id", "frame_idx")),

    Q(
      "mm_resize_stats",
      """Real image RESIZE, oracle-checked: even-dimension PNGs
        |(w=2*(2+id%4), h=2*(2+id%3), gray (id*31+i) mod 256) are
        |ImageIO-decoded and downscaled to exactly half size with
        |Graphics2D at NEAREST_NEIGHBOR, emitting the resized dimensions
        |and the exact channel sum of the RESIZED pixels. The 2x ratio
        |makes the interpolation closed-form — every Java2D blit path
        |picks dst(x,y) = src(2x+1, 2y+1), the pixel-center nearest — so
        |the oracle predicts the resampled image arithmetically without
        |an image library: equality proves decode AND resample are
        |pixel-exact. Partition-local, no shuffle.""".stripMargin,
      Some(
        """SELECT doc_id AS media_id,
          |       CAST(2 + doc_id % 4 AS INT) AS out_w,
          |       CAST(2 + doc_id % 3 AS INT) AS out_h,
          |       CAST(3 * list_sum(list_transform(
          |              range((2 + doc_id % 4) * (2 + doc_id % 3)),
          |              j -> (doc_id * 31
          |                    + (2 * (j // (2 + doc_id % 4)) + 1)
          |                      * (2 * (2 + doc_id % 4))
          |                    + 2 * (j % (2 + doc_id % 4)) + 1) % 256))
          |            AS BIGINT) AS px_sum
          |FROM documents
          |ORDER BY media_id""".stripMargin),
      (s, dir) =>
        Multimodal.resizeImageStats(
          Multimodal.synthesizePngs2x(Tables.documents(s, dir)))
          .toDF().orderBy("media_id")),

    Q(
      "mm_resize_fractional",
      """FRACTIONAL-ratio image resize (2:3 horizontal, 3:5 vertical),
        |oracle-checked — closing the 2x-only limitation: Java2D blit paths
        |are not bit-reproducible at non-integer ratios, so the resampler
        |here is our own, defined in integer arithmetic over the DECODED
        |pixels (Multimodal.resizeFractionalStats). Pixel centers carry as
        |the exact pair nx=(2x+1)*w-dw over Dx=2*dw; NEAREST picks
        |((2x+1)*w) div (2*dw); BILINEAR blends the edge-clamped 2x2
        |neighborhood with fixed-point weights and one truncating division
        |— deterministic at ANY ratio by construction. The oracle predicts
        |both sums arithmetically from the closed-form pixels; equality
        |proves decode AND both resamplers pixel-exact. Partition-local,
        |no shuffle.""".stripMargin,
      Some(
        """WITH g AS (
          |  SELECT doc_id,
          |         2 * (2 + doc_id % 4) AS w,
          |         2 * (2 + doc_id % 3) AS h
          |  FROM documents),
          |d AS (
          |  SELECT doc_id, w, h,
          |         GREATEST(1, (2*w) // 3) AS dw,
          |         GREATEST(1, (3*h) // 5) AS dh
          |  FROM g),
          |px AS (
          |  SELECT d.*, t.j FROM d,
          |  LATERAL (SELECT unnest(range(d.dw * d.dh)) AS j) t),
          |e AS (
          |  SELECT doc_id, w, h, dw, dh,
          |         ((2*(j % dw)+1)*w) // (2*dw) AS sx,
          |         ((2*(j // dw)+1)*h) // (2*dh) AS sy,
          |         (2*(j % dw)+1)*w - dw AS nx,
          |         (2*(j // dw)+1)*h - dh AS ny,
          |         2*dw AS bx, 2*dh AS by
          |  FROM px),
          |f AS (
          |  SELECT doc_id, w, h, dw, dh, sx, sy, bx, by,
          |         nx // bx AS x0, nx % bx AS fx,
          |         ny // by AS y0, ny % by AS fy,
          |         LEAST(nx // bx + 1, w-1) AS x1,
          |         LEAST(ny // by + 1, h-1) AS y1
          |  FROM e),
          |v AS (
          |  SELECT doc_id, dw, dh,
          |         (doc_id*31 + sy*w + sx) % 256 AS vn,
          |         (  ((doc_id*31 + y0*w + x0) % 256) * (bx-fx) * (by-fy)
          |          + ((doc_id*31 + y0*w + x1) % 256) * fx * (by-fy)
          |          + ((doc_id*31 + y1*w + x0) % 256) * (bx-fx) * fy
          |          + ((doc_id*31 + y1*w + x1) % 256) * fx * fy) // (bx*by) AS vb
          |  FROM f)
          |SELECT doc_id AS media_id,
          |       CAST(dw AS INT) AS out_w, CAST(dh AS INT) AS out_h,
          |       CAST(3 * SUM(vn) AS BIGINT) AS px_sum_nearest,
          |       CAST(3 * SUM(vb) AS BIGINT) AS px_sum_bilinear
          |FROM v GROUP BY 1, 2, 3
          |ORDER BY media_id""".stripMargin),
      (s, dir) =>
        Multimodal.resizeFractionalStats(
          Multimodal.synthesizePngs2x(Tables.documents(s, dir)))
          .toDF().orderBy("media_id")),

    Q(
      "mm_phash_dedup",
      """Perceptual-hash IMAGE DEDUP — the multimodal twin of the text
        |near-dup family: assets are REAL PNGs where docs sharing a class
        |(doc_id mod 37) render the same base image shifted by a PER-DOC
        |brightness offset (doc_id mod 23), so every blob and every pixel
        |array is distinct — byte/exact-pixel dedup finds nothing — yet the
        |average-hash (bit i = pixel_i*n >= sum, division-free integer
        |threshold) is provably brightness-invariant and collapses each
        |class to one 64-bit fingerprint. The query ImageIO-decodes each
        |blob, fingerprints scan-side, and groups ONLY the 8-byte hashes:
        |decode cost scans with the corpus, shuffle carries fingerprints,
        |never pixels — the shape that makes image dedup viable at 100 TB.
        |The oracle reproduces decode+hash arithmetically from the closed
        |form (offset included — invariance is proven, not assumed).""".stripMargin,
      Some(
        """WITH px AS (
          |  SELECT doc_id,
          |         doc_id % 37 AS cls,
          |         CAST(1 + (doc_id % 37) % 8 AS INT) AS img_w,
          |         CAST(1 + (doc_id % 37) % 5 AS INT) AS img_h
          |  FROM documents),
          |hp AS (
          |  SELECT doc_id, cls, img_w, img_h, img_w * img_h AS n,
          |         list_transform(range(img_w * img_h),
          |           i -> (cls*31 + i*17) % 201 + doc_id % 23) AS vs
          |  FROM px),
          |hh AS (
          |  SELECT doc_id, cls, img_w, img_h,
          |         CAST(list_sum(list_transform(range(n),
          |           i -> CASE WHEN vs[i+1] * n >= list_sum(vs)
          |                     THEN 1::BIGINT << i ELSE 0::BIGINT END))
          |           AS BIGINT) AS phash
          |  FROM hp)
          |SELECT phash, img_w, img_h,
          |       CAST(COUNT(*) AS BIGINT) AS n_docs,
          |       CAST(COUNT(DISTINCT cls) AS BIGINT) AS n_classes,
          |       MIN(doc_id) AS rep_doc,
          |       CAST(SUM(doc_id) AS BIGINT) AS doc_sum
          |FROM hh
          |GROUP BY 1, 2, 3
          |ORDER BY phash, img_w, img_h""".stripMargin),
      (s, dir) =>
        Multimodal.decodePhash(
          Multimodal.synthesizeNearDupPngs(Tables.documents(s, dir)))
          .toDF()
          .groupBy(col("phash"), col("img_w"), col("img_h"))
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(expr("media_id % 37")).as("n_classes"),
            min(col("media_id")).as("rep_doc"),
            sum(col("media_id")).as("doc_sum"))
          .orderBy("phash", "img_w", "img_h")),

    Q(
      "mm_media_stats",
      """Binary media columns: synthesized assets (UTF-8 bytes as the
        |encoded blob, modality from id, metadata from length) with
        |scan-side stats — byte length, content digest, strided frame-sample
        |digests. The oracle works on the text twin of the blob, proving the
        |binary plumbing is byte-exact.""".stripMargin,
      Some(
        """SELECT doc_id AS media_id,
          |       ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
          |       length(text) AS n_bytes,
          |       md5(text) AS digest,
          |       md5(substr(text, 1, 16)) AS frame_0,
          |       md5(substr(text, 17, 16)) AS frame_1,
          |       md5(substr(text, 33, 16)) AS frame_2
          |FROM documents
          |ORDER BY media_id""".stripMargin),
      (s, dir) =>
        Multimodal.mediaStats(
          Multimodal.synthesize(Tables.documents(s, dir)), frameLen = 16, nFrames = 3)
          .orderBy("media_id")),

    Q(
      "mm_frame_manifest",
      """Frame-sampling manifest: one row per 16-byte window at stride 32
        |over each asset — frame index, byte offset, window digest. The
        |planning step a distributed decode fans out over (each row = one
        |decode task keyed by asset+offset); pure row-local metadata
        |arithmetic, generator fan-out at the scan, no shuffle. The oracle
        |runs on the blob's text twin (byte-identical for these UTF-8
        |assets), proving the binary slicing exact.""".stripMargin,
      Some(
        """WITH m AS (
          |  SELECT doc_id AS media_id,
          |         ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
          |         text, length(text) AS n_bytes
          |  FROM documents),
          |f AS (SELECT media_id, kind, text,
          |        unnest(range((n_bytes - 16) // 32 + 1)) AS frame_id
          |      FROM m WHERE n_bytes >= 16)
          |SELECT media_id, kind,
          |       CAST(frame_id AS BIGINT) AS frame_id,
          |       CAST(frame_id * 32 AS BIGINT) AS byte_off,
          |       md5(substr(text, CAST(frame_id * 32 + 1 AS INT), 16)) AS frame_digest
          |FROM f
          |ORDER BY media_id, frame_id""".stripMargin),
      (s, dir) =>
        Multimodal.frameManifest(
          Multimodal.synthesize(Tables.documents(s, dir)), window = 16, stride = 32)
          .orderBy("media_id", "frame_id")))
}
