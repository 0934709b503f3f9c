package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages as typed Dataset transformations.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is real
  * and tested; the actual media decode is STUBBED with a deterministic
  * fake (no image/audio libs ship in this container). Every stub is marked;
  * swapping in a real decoder changes only the function body, not the plan.
  */
object Multimodal {

  final case class MediaMeta(
      kind: String, // image | audio | video
      width: Int,
      height: Int,
      sampleRate: Int,
      durationMs: Long)

  final case class MediaFile(doc_id: Long, meta: MediaMeta, media: Array[Byte])

  final case class MediaFeatures(doc_id: Long, kind: String, features: Array[Float])

  /** deterministic synthetic media table (seeded, no external data).
    * Images are REAL binary PPM files and audio REAL PCM16 WAV files
    * (MediaCodecs) — the decode stages below parse them for real; video
    * payloads stay random bytes behind the declared frame-sampling stub.
    */
  def syntheticTable(spark: SparkSession, rows: Long, seed: Long = 42L,
      parts: Int = 8): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(0L, rows, 1L, parts).map { i =>
      val rng = new java.util.SplittableRandom(seed ^ (i * 0x9e3779b97f4a7c15L))
      val kind = Seq("image", "audio", "video")(rng.nextInt(3))
      kind match {
        case "image" =>
          val w = 16 + rng.nextInt(64)
          val h = 16 + rng.nextInt(64)
          val rgb = new Array[Byte](3 * w * h)
          rng.nextBytes(rgb)
          MediaFile(i, MediaMeta(kind, w, h, 0, 0L), MediaCodecs.encodePpm(w, h, rgb))
        case "audio" =>
          val rate = 8000 + rng.nextInt(8000)
          val durMs = 100L + rng.nextInt(500)
          val n = (rate * durMs / 1000L).toInt
          val samples = Array.tabulate(n)(k =>
            (math.sin(k * 0.05 + (i % 17)) * 12000 +
              rng.nextInt(2000) - 1000).toShort)
          MediaFile(i, MediaMeta(kind, 0, 0, rate, durMs), MediaCodecs.encodeWav(rate, samples))
        case _ =>
          val payload = new Array[Byte](256 + rng.nextInt(2048))
          rng.nextBytes(payload)
          MediaFile(i, MediaMeta(kind, 320, 240, 0, 1000L + rng.nextInt(60000)), payload)
      }
    }
  }

  /** Decode → fixed-dim feature vector. REAL for PPM images (16-bin
    * luminance histogram) and PCM16 WAV audio (16-window RMS envelope) via
    * MediaCodecs; other formats (JPEG/PNG/MP3/video — no codec libs in this
    * container) fall back to the declared deterministic stub. Plan shape
    * (narrow map over binary, no shuffle) is identical either way.
    */
  val FeatureDim = 16

  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val real = m.meta.kind match {
        case "image" => MediaCodecs.ppmLumaHistogram(m.media, FeatureDim)
        case "audio" => MediaCodecs.wavRmsWindows(m.media, FeatureDim)
        case _ => None
      }
      MediaFeatures(m.doc_id, m.meta.kind, real.getOrElse(stubFeatures(m.media)))
    }
  }

  private[multimodal] def stubFeatures(bytes: Array[Byte]): Array[Float] = {
    // ??? real decode goes here for formats without a pure-JVM parser —
    // deterministic fake below keeps shape/determinism testable
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(1, bytes.length / FeatureDim)
    var d = 0
    while (d < FeatureDim) { out(d) /= n; d += 1 }
    out
  }

  /** Resize: REAL nearest-neighbor pixel resample for PPM images
    * (MediaCodecs.resizePpmNearest); non-PPM image payloads fall back to
    * the declared stub (metadata rescale + proportional truncation).
    */
  def resize(media: Dataset[MediaFile], width: Int, height: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.meta.kind != "image") m
      else MediaCodecs.resizePpmNearest(m.media, width, height) match {
        case Some(resized) =>
          m.copy(meta = m.meta.copy(width = width, height = height), media = resized)
        case None => // stub path for undecodable formats
          val scale = math.min(1.0,
            (width.toLong * height).toDouble / math.max(1L, m.meta.width.toLong * m.meta.height))
          val keep = math.max(16, (m.media.length * scale).toInt)
          m.copy(
            meta = m.meta.copy(width = width, height = height),
            media = java.util.Arrays.copyOf(m.media, math.min(keep, m.media.length)))
      }
    }
  }

  /** STUB frame sampling: every Nth fixed-size chunk stands in for every
    * Nth decoded frame — output is (doc_id, frame_idx, frame binary)
    */
  def sampleFrames(media: Dataset[MediaFile], everyNth: Int, frameBytes: Int = 128): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      if (m.meta.kind != "video") Iterator.empty
      else {
        val nFrames = m.media.length / frameBytes
        (0 until nFrames by everyNth).iterator.map { f =>
          (m.doc_id, f,
            java.util.Arrays.copyOfRange(m.media, f * frameBytes, (f + 1) * frameBytes))
        }
      }
    }.toDF("doc_id", "frame_idx", "frame")
  }

  /** per-kind feature aggregation demonstrating the downstream join shape:
    * features co-partitioned by kind, small dims broadcast as needed
    */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame = {
    features
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        avg(element_at(col("features"), 1)).as("f0_mean"),
        avg(aggregate(col("features"), lit(0.0d), (a, x) => a + x) / Multimodal.FeatureDim)
          .as("mean_activation"))
      .orderBy("kind")
  }
}
