package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata alongside. The Spark-side machinery
 * here — schema, partition-preserving per-batch processing via typed
 * `mapPartitions`, deterministic batch shapes — is real and tested; the
 * codec itself is a STUB (`FakeCodec`): this container has no image/audio
 * libraries, so decode derives deterministic pseudo-metadata from the
 * bytes. Swapping `FakeCodec` for a real JNI/library decoder changes no
 * plan shape.
 *
 * Why mapPartitions (not a per-row UDF): a real decoder amortizes codec
 * init per partition and can batch into native calls — same shape as
 * PySpark's mapInPandas/mapInArrow. The partition iterator is the batch.
 */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
      n_frames: Int, media_bytes: Long)
  final case class Frame(doc_id: Long, frame_idx: Int, frame_offset: Long)

  /** Deterministic stand-in for an image/video codec. Real implementation
    * would be e.g. libjpeg/ffmpeg behind JNI — init once per partition. */
  object FakeCodec {
    def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta = {
      def b(i: Int): Int = if (bytes.length > i) bytes(i) & 0xff else 0
      MediaMeta(
        doc_id = id,
        width = (b(0) + 256 * b(1)) % 1024,
        height = (b(2) + 256 * b(3)) % 768,
        n_frames = 1 + b(4) % 8,
        media_bytes = bytes.length.toLong)
    }
  }

  /** Synthesize a binary media column from text (fixtures carry no real
    * media); in production this column comes straight from parquet/webds. */
  def synthesizeMedia(docs: DataFrame): DataFrame =
    graft.ops.Par.fanOut(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))

  /** Decode typed metadata from the binary column — partition-wise, codec
    * initialized once per partition (here: the stub). */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        // real codec: val codec = Codec.open() here, close at end
        rows.map(r => FakeCodec.decodeMeta(r.doc_id, r.media))
      }
  }

  /** Sample every `stride`-th frame of each media payload: one output row
    * per sampled frame with its byte offset — the fan-out shape of video
    * frame extraction (explode keeps it fully distributed; no driver loop). */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    decodeMeta(spark, media).flatMap { m =>
      (0 until m.n_frames by stride).map { i =>
        Frame(m.doc_id, i, i.toLong * (m.media_bytes / math.max(m.n_frames, 1)))
      }
    }
  }

  final case class Resized(doc_id: Long, media: Array[Byte], width: Int, height: Int)

  /** "Resize" each media payload to a target geometry — the stub maps the
    * byte budget deterministically (truncate / cycle-pad to w*h bytes);
    * a real implementation swaps the per-partition codec call, the plan
    * (binary in → binary out + typed dims, partition-preserving) stays. */
  def resize(spark: SparkSession, media: DataFrame, width: Int = 64, height: Int = 64): Dataset[Resized] = {
    import spark.implicits._
    val target = width * height
    media.select(col("doc_id"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val out = new Array[Byte](target)
          if (r.media.nonEmpty) {
            var i = 0
            while (i < target) { out(i) = r.media(i % r.media.length); i += 1 }
          }
          Resized(r.doc_id, out, width, height)
        }
      }
  }

  /** Perceptual-hash near-duplicate media pairs: a bit fingerprint per
    * payload, then ALL pairs within `maxHamming` via the Manku
    * multi-index ([[Dedup.hammingPairs]] — band equi-joins, never
    * O(n²)). The fingerprint is a simhash over the payload's 4-byte
    * groups (hex-grouped, md5 token family — cross-engine
    * reproducible); a REAL pHash is a DCT over decoded pixels (codec
    * stubbed in this container), and swapping it in changes only the
    * fingerprint projection — the pairing machinery and plan shape stay
    * exactly as tested. This is image/video near-dup for the training
    * pipeline: one scan to fingerprint, d+1 keyed band shuffles. */
  def phashPairs(
      media: DataFrame,
      bits: Int = 32,
      maxHamming: Int = 3): DataFrame = {
    val grouped = regexp_replace(hex(col("media")), "(.{8})", "$1 ")
    val fp = graft.ops.Par.fanOut(media.select(col("doc_id"), col("media")))
      .select(col("doc_id").as("id"),
        Dedup.simhash(grouped, bits, md5Family = true).as("fp"))
    Dedup.hammingPairs(fp, bits, maxHamming)
  }

  final case class AudioEnergy(doc_id: Long, n_frames: Int,
      silent_frames: Int, silence_ratio: Double, energy_sq: Long)

  /** Frame-level AUDIO ENERGY profile over the binary payload treated
    * as 8-bit PCM (the codec stub's convention; a real decoder swaps
    * in behind the same partition-wise loop, the plan shape stays):
    * fixed `frameLen`-byte frames (final partial frame kept), each
    * frame's INTEGER energy Σ s², silent iff
    * energy < frame_len · thr² (integer cross-multiply — no float
    * boundary anywhere), plus the clip's total energy and silence
    * ratio. The training-pipeline read: silence/VAD pre-filter and
    * loudness features computed where the bytes live — waveforms
    * never ride a shuffle, only the 5-column profile does. */
  def audioEnergy(spark: SparkSession, media: DataFrame,
      frameLen: Int = 64, silenceThr: Int = 60): Dataset[AudioEnergy] = {
    import spark.implicits._
    val thr2 = silenceThr.toLong * silenceThr
    media.select(col("doc_id"), col("media")).as[MediaRow]
      .map { r =>
        val n = r.media.length
        val nf = (n + frameLen - 1) / frameLen
        var silent = 0
        var total = 0L
        var f = 0
        while (f < nf) {
          val lo = f * frameLen
          val hi = math.min(lo + frameLen, n)
          var e = 0L
          var i = lo
          while (i < hi) { val s = (r.media(i) & 0xff).toLong; e += s * s; i += 1 }
          total += e
          if (e < (hi - lo) * thr2) silent += 1
          f += 1
        }
        val ratio =
          if (nf > 0)
            java.math.BigDecimal.valueOf(silent.toDouble / nf)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
          else 0.0
        AudioEnergy(r.doc_id, nf, silent, ratio, total)
      }
  }

  /** Fixed-width feature vector from the payload (stub: bucketed byte
    * sums normalized to [0,1]) — the shape of an embedding-extraction
    * stage: binary in, dense Array[Float] out, schema declared. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dims: Int = 8): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[MediaRow]
      .map { r =>
        val acc = new Array[Long](dims)
        var i = 0
        while (i < r.media.length) { acc(i % dims) += (r.media(i) & 0xff); i += 1 }
        val n = math.max(r.media.length / dims, 1)
        (r.doc_id, acc.map(s => s.toFloat / (n * 255f)))
      }
      .toDF("doc_id", "features")
  }
}
