package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline (beyond-parity
  * extension): media as opaque `binary` columns with typed metadata, plus
  * feature-extraction stages. The IMAGE path is real end-to-end —
  * [[Multimodal.synthesizePngs]] encodes and [[Multimodal.decodeImageStats]]
  * decodes actual PNGs via the JDK's `javax.imageio`, oracle-checked
  * (`mm_decode_stats`) — and so is the AUDIO path:
  * [[Multimodal.synthesizeWavs]] / [[Multimodal.decodeWavStats]] run real
  * WAV containers through `javax.sound.sampled` (`mm_audio_decode`).
  * Only the VIDEO stage keeps a deterministic stand-in codec (no video
  * decoder ships in the JDK) behind the same production-shaped plumbing.
  *
  * Layout mirrors how a lakehouse carries media: one row per asset,
  * `blob BINARY` + `meta STRUCT` + modality discriminator. Feature
  * extraction is `mapPartitions` over a typed Dataset — the same
  * batch-per-partition shape a vectorized (Arrow) UDF presents, so
  * swapping the stub for a real decoder is a one-function change. The
  * extractor is partition-local: no shuffle, scales with input splits.
  */
object Multimodal {
  case class MediaRow(media_id: Long, kind: String, blob: Array[Byte],
                      width: Int, sample_rate: Int, n_frames: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           mean_byte: Double, frames_sampled: Int,
                           feature: Array[Double])

  /** Synthesize deterministic media assets from the documents table: the
    * UTF-8 bytes stand in for the encoded asset; metadata derives from the
    * blob. Real pipelines land here from binary file sources
    * (`spark.read.format("binaryFile")`). */
  def synthesize(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("blob"))
      .withColumn("width", (length(col("blob")) % 640).cast("int"))
      .withColumn("sample_rate", lit(16000))
      .withColumn("n_frames", (length(col("blob")) / 10).cast("int"))

  /** STUB DECODER — deterministic fake standing in for the real codec
    * (image decode / audio resample / video frame extraction). Consumes the
    * raw bytes and emits a fixed-width feature vector (normalized 16-bin
    * byte histogram). The real implementation would call the codec here;
    * everything around it (typed batch iteration, partition locality,
    * output schema) is production-shaped. */
  private def decodeStub(blob: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < blob.length) { hist((blob(i) & 0xff) / 16) += 1.0; i += 1 }
    val n = math.max(blob.length, 1)
    hist.map(_ / n)
  }

  /** Feature extraction: one pass per partition, batch-iterating rows
    * exactly like a vectorized UDF would receive them. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val feat = decodeStub(r.blob)
        val mean =
          if (r.blob.isEmpty) 0.0
          else r.blob.map(_ & 0xff).sum.toDouble / r.blob.length
        MediaFeatures(r.media_id, r.kind, r.blob.length, mean,
          frames_sampled = math.min(r.n_frames, 8), feature = feat)
      }
    }
  }

  case class ResizedMedia(media_id: Long, kind: String, blob: Array[Byte],
                          width: Int, target_width: Int)
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB RESIZE — the image/audio downsample stage. The stub keeps every
    * ceil(width/target)-th byte (a real resampler would interpolate
    * pixels/samples); the plumbing is the production shape: typed in/out
    * schemas, explicit batch iteration (`grouped`) exactly as an Arrow
    * batch would arrive, partition-local, no shuffle. */
  def resize(media: Dataset[MediaRow], targetWidth: Int,
             batchSize: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val stride = math.max(1, math.ceil(
            math.max(r.width, 1).toDouble / targetWidth).toInt)
          val out = r.blob.indices.collect {
            case i if i % stride == 0 => r.blob(i)
          }.toArray
          ResizedMedia(r.media_id, r.kind, out, r.width, targetWidth)
        }
      }
    }
  }

  /** STUB FRAME SAMPLER — the video stage: emit up to `n` strided frames
    * per asset as one row each (media_id, frame_idx, bytes), the long
    * format downstream vision encoders consume. flatMap = generator
    * shape; row count multiplies by the sample rate, so run AFTER
    * filtering, never before. */
  def sampleFrames(media: Dataset[MediaRow], frameLen: Int, n: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val available = math.max(r.blob.length / math.max(frameLen, 1), 0)
      val take = math.min(n, available)
      val stride = if (take == 0) 1 else math.max(1, available / take)
      (0 until take).map { k =>
        val start = k * stride * frameLen
        MediaFrame(r.media_id, k,
          r.blob.slice(start, math.min(start + frameLen, r.blob.length)))
      }
    }
  }

  case class PngAsset(media_id: Long, blob: Array[Byte])
  case class DecodedImage(media_id: Long, img_w: Int, img_h: Int, px_sum: Long)

  /** Synthesize REAL PNG assets — actual encoded images via `javax.imageio`
    * (pure JVM, ships in every JDK), not byte stand-ins. Dimensions and
    * pixel values are a closed-form function of `doc_id` (gray value
    * `(doc_id*31 + i) mod 256` for pixel index `i` in row-major order), so
    * a SQL oracle can compute the expected decode output without ever
    * touching an image library: the only way the decode query matches is
    * if the PNG round-trip is byte-faithful. Partition-local, no shuffle —
    * the same scaling shape as reading `binaryFile` sources. */
  def synthesizePngs(documents: DataFrame): Dataset[PngAsset] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = 1 + (id % 8).toInt
        val h = 1 + (id % 5).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = ((id * 31 + i) % 256).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            i += 1; x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        PngAsset(id, bos.toByteArray)
      }
    }
  }

  /** REAL IMAGE DECODE — `ImageIO.read` over the blob column, in the same
    * batched `mapPartitions` shape the codec stubs documented (one decoder
    * instance per partition, rows streamed through it, no shuffle). Emits
    * per-asset decoded stats: true pixel dimensions and the exact sum of
    * all channel values — integers, so the oracle comparison is hash-exact.
    * An undecodable blob fails the task loudly (no silent nulls: at 100 TB
    * a corrupt asset should surface in Spark's task retry, not vanish). */
  def decodeImageStats(media: Dataset[PngAsset]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
        require(img != null, s"undecodable image blob for media_id=${r.media_id}")
        var sum = 0L; var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        DecodedImage(r.media_id, img.getWidth, img.getHeight, sum)
      }
    }
  }

  case class WavAsset(media_id: Long, blob: Array[Byte])
  case class DecodedAudio(media_id: Long, sample_rate: Int, n_samples: Long, amp_sum: Long)

  /** Synthesize REAL WAV assets — actual encoded audio via
    * `javax.sound.sampled` (pure JVM, no audio device needed), the audio
    * twin of [[synthesizePngs]]: 8-bit unsigned PCM mono at 8 kHz, sample
    * `i` = `(doc_id*7 + i*13) mod 256`, length `100 + doc_id mod 200`
    * frames — closed-form, so a SQL oracle predicts the decoded stats
    * without an audio library. Partition-local, no shuffle. */
  def synthesizeWavs(documents: DataFrame): Dataset[WavAsset] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
      ids.map { id =>
        val n = (100 + id % 200).toInt
        val pcm = Array.tabulate[Byte](n)(i => ((id * 7 + i * 13) % 256).toByte)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        WavAsset(id, bos.toByteArray)
      }
    }
  }

  /** REAL AUDIO DECODE — `AudioSystem.getAudioInputStream` over the blob,
    * batched `mapPartitions`, no shuffle: emits the container's true
    * sample rate and frame count plus the exact sum of all unsigned
    * sample amplitudes (integers — the oracle compare is hash-exact).
    * Undecodable blobs fail the task loudly, like the image path. */
  def decodeWavStats(media: Dataset[WavAsset]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.blob))
        val frames = ais.getFrameLength
        val data = ais.readAllBytes()
        require(data.length == frames,
          s"audio frame count mismatch for media_id=${r.media_id}")
        var sum = 0L; var i = 0
        while (i < data.length) { sum += (data(i) & 0xff); i += 1 }
        DecodedAudio(r.media_id, ais.getFormat.getSampleRate.toInt, frames, sum)
      }
    }
  }

  /** Expression-side media stats (no decode needed): byte length, content
    * digest, strided frame-sample digests — all computable at the scan. */
  def mediaStats(media: DataFrame, frameLen: Int, nFrames: Int): DataFrame = {
    val frames = (0 until nFrames).map { k =>
      md5(substring(col("blob"), k * frameLen + 1, frameLen)).as(s"frame_$k")
    }
    media.select(
      Seq(col("media_id"), col("kind"),
        length(col("blob")).as("n_bytes"),
        md5(col("blob")).as("digest")) ++ frames: _*)
  }

  /** Frame-extraction MANIFEST: one row per strided window over each
    * asset's bytes — frame index, byte offset, window digest. This is the
    * planning step a distributed decode fans out over (each manifest row
    * becomes one decode task keyed by (asset, offset)); deriving it is
    * pure metadata arithmetic (row-local sequence + slice), so the
    * manifest is cheap at any corpus size and the expensive codec work
    * downstream is exactly sized to the frames actually sampled. */
  def frameManifest(media: DataFrame, window: Int, stride: Int): DataFrame = {
    val nFrames = (floor((length(col("blob")) - window) / stride) + 1).cast("int")
    media
      .filter(length(col("blob")) >= window)
      .select(col("media_id"), col("kind"), col("blob"),
        posexplode(sequence(lit(0), nFrames - 1)))
      .select(
        col("media_id"), col("kind"),
        col("pos").cast("long").as("frame_id"),
        (col("pos").cast("long") * stride).as("byte_off"),
        md5(col("blob").substr(col("pos") * stride + 1, lit(window)))
          .as("frame_digest"))
  }
}
