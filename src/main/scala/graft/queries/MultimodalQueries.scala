package graft.queries

import graft.ops.Multimodal
import graft.sources.Tables

/** Expression-side multimodal stats as an oracle-checked query; the typed
  * mapPartitions decode path is covered by MultimodalSpec (a stub codec
  * has no SQL oracle).
  */
object MultimodalQueries {
  val qs: Seq[Q] = Seq(
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
          .orderBy("media_id")))
}
