package htmlspark.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: media (image/audio/video) carried as opaque
  * `binary` columns with typed metadata, the pattern a training-data
  * pipeline needs at 100 TB (decode work rides the same typed-Dataset-map
  * shape as the HTML parse; bytes never shuffle except where salted).
  *
  * The actual codec work is STUBBED (this container ships no image/audio
  * libraries): `FakeDecode` derives deterministic pseudo-metadata from the
  * blob bytes. Everything around it — schema, magic-byte detection,
  * partitioning, batch shape, frame sampling — is real and tested, so a
  * real decoder drops in by replacing one function.
  */
object MultimodalOps {

  final case class MediaMeta(
      url: String,
      media_type: String, // sniffed from magic bytes
      n_bytes: Int,
      // === stubbed decode outputs (deterministic fake; see FakeDecode) ===
      width: Int,
      height: Int,
      duration_ms: Int,
      decode_ok: Boolean)

  final case class Frame(url: String, frame_idx: Int, offset: Int,
                         frame_bytes: Array[Byte])

  /** One media row: opaque blob + its url. The 100 TB table adds typed
    * metadata columns next to the binary; this is the minimal shape. */
  final case class MediaRow(url: String, blob: Array[Byte])

  /** Deterministic synthetic media corpus (PagesGen.mediaBlob: real magic
    * bytes over 7 container kinds). Generation is spark.range → map:
    * embarrassingly parallel, no shared state. */
  def mediaCorpus(spark: SparkSession, n: Long,
                  partitions: Int = 32): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions)
      .map(i => MediaRow(s"media://synth/$i", PagesGen.mediaBlob(i)))
  }

  /** Magic-byte sniffing — real logic (public file signatures). */
  def sniffMediaType(b: Array[Byte]): String = {
    if (b.length >= 8 &&
        (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "image/png"
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) "image/jpeg"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "image/gif"
    else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') "video/mp4"
    else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') "audio/wav"
    else if (b.length >= 3 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') "audio/mpeg"
    else "application/octet-stream"
  }

  /** ??? in spirit — STUB: a real implementation calls the codec. The fake
    * is deterministic in the bytes so tests and oracle runs are stable. */
  object FakeDecode {
    def apply(mediaType: String, b: Array[Byte]): (Int, Int, Int, Boolean) = {
      if (b.isEmpty) return (0, 0, 0, false)
      var h = 0xCBF29CE484222325L
      val step = math.max(b.length / 64, 1)
      var i = 0
      while (i < b.length) { h = (h ^ b(i)) * 1099511628211L; i += step }
      val w = 160 + (Math.floorMod(h, 1760L)).toInt        // 160..1919
      val ht = 120 + (Math.floorMod(h >>> 17, 960L)).toInt // 120..1079
      val dur = if (mediaType.startsWith("video") || mediaType.startsWith("audio"))
        1000 + (Math.floorMod(h >>> 31, 600000L)).toInt else 0
      (w, ht, dur, true)
    }
  }

  /** Decode/feature-extract stage: typed Dataset map over binary blobs. */
  def mediaMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val b = if (m.blob == null) Array.emptyByteArray else m.blob
      val mt = sniffMediaType(b)
      val (w, h, d, ok) = FakeDecode(mt, b)
      MediaMeta(m.url, mt, b.length, w, h, d, ok)
    }
  }

  /** Frame sampling: every `everyBytes` window of a "video" blob becomes a
    * frame row (typed flatMap — the Generator/UDTF shape without a custom
    * Catalyst Generator). Frame count bounded to keep the row blowup
    * explicit and predictable. */
  def sampleFrames(media: Dataset[MediaRow], everyBytes: Int = 512,
                   maxFrames: Int = 16): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val b = if (m.blob == null) Array.emptyByteArray else m.blob
      val n = math.min(maxFrames, math.max(b.length / everyBytes, 1))
      (0 until n).iterator.map { i =>
        val off = i * everyBytes
        val end = math.min(off + 64, b.length) // stub: 64-byte "frame"
        Frame(m.url, i, off, java.util.Arrays.copyOfRange(b, math.min(off, b.length), end))
      }
    }
  }

  /** Per-url sniff outcome over the media corpus — the ORACLE face (p12):
    * the expected side (PagesGen.expectedMediaMeta) derives media_type from
    * the generator's kind with no sniffing involved, so a mismatch means
    * the magic-byte detection itself broke. */
  def mediaSniff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = PagesQueries.sampleN(spark, dir)
    mediaCorpus(spark, n)
      .map(m => (m.url, sniffMediaType(m.blob), m.blob.length.toLong))
      .toDF("url", "media_type", "n_bytes")
  }

  /** Driver-contract query: media metadata stats over the synthesized
    * media corpus (real magic bytes across 7 container kinds). */
  def mediaStats(spark: SparkSession, dir: String): DataFrame = {
    // same sampling policy as the p12 oracle face — one source of truth
    val n = PagesQueries.sampleN(spark, dir)
    mediaMeta(mediaCorpus(spark, n))
      .groupBy("media_type", "decode_ok")
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes").cast("long")).as("sum_bytes"),
        min(col("width")).cast("long").as("min_w"),
        max(col("width")).cast("long").as("max_w"))
  }

  /** Frame-sampling corpus size — ONE constant shared with the Verify-side
    * p07 oracle derivation (ADVICE r3: two hardcoded 1000Ls could silently
    * drift, turning the oracle into a false failure or a vacuous pass). */
  val FrameCorpusN = 1000L

  /** Driver-contract query: frame-sampling fan-out shape. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = FrameCorpusN
    sampleFrames(mediaCorpus(spark, n))
      .groupBy("url")
      .agg(count(lit(1)).as("n_frames"),
        max(col("offset")).cast("long").as("max_offset"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_frames")).as("n_frames_total"),
        max(col("n_frames")).as("max_frames_per_doc"))
  }
}
