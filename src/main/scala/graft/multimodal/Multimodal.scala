package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages as typed Dataset transformations.
  *
  * Image (PPM), audio (PCM16 WAV) and video (Y4M/YUV4MPEG2) decode are
  * REAL pure-JVM parsers (MediaCodecs) — container formats with public,
  * trivial specs need no external libs. Formats that would need a codec
  * library (JPEG/PNG/MP3/H.264 — none ship in this container) fall back to
  * a deterministic, clearly-marked fallback; swapping in a real decoder
  * there changes only the function body, not the plan shape.
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
    * Images are REAL binary PPM files, audio REAL PCM16 WAV files, and
    * video REAL Y4M (YUV4MPEG2) streams (MediaCodecs) — every decode stage
    * below parses its container for real.
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
          val w = 8 + rng.nextInt(24)
          val h = 8 + rng.nextInt(24)
          val fps = 5 + rng.nextInt(25)
          val nFrames = 4 + rng.nextInt(12)
          val frames = Array.fill(nFrames) {
            val f = new Array[Byte](3 * w * h)
            rng.nextBytes(f)
            f
          }
          MediaFile(i,
            MediaMeta(kind, w, h, 0, nFrames * 1000L / fps),
            MediaCodecs.encodeY4m(w, h, fps, 1, frames))
      }
    }
  }

  /** ORACLE-REPLAYABLE deterministic media table: the same REAL container
    * encoders as syntheticTable (binary PPM / PCM16 WAV / Y4M), but every
    * parameter and payload byte is plain modular arithmetic over the row
    * id — SplittableRandom's nextInt carries a rejection loop that is not
    * safely expressible in SQL, while these formulas replay exactly in
    * DuckDB (OracleSql.mediaStats; validated in tools/oracle_proto8.py).
    * ORACLE-COUPLED: any change here breaks the paired SQL.
    */
  def oracleTable(spark: SparkSession, rows: Long, parts: Int = 8): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(0L, rows, 1L, parts).map(i => oracleRow(i))
  }

  def oracleRow(i: Long): MediaFile = (i % 3) match {
    case 0 =>
      val w = (16 + (i * 7) % 64).toInt
      val h = (16 + (i * 11) % 64).toInt
      val rgb = Array.tabulate(3 * w * h)(j => ((i + 3L * j) % 256).toByte)
      MediaFile(i, MediaMeta("image", w, h, 0, 0L), MediaCodecs.encodePpm(w, h, rgb))
    case 1 =>
      val rate = (8000 + (i * 37) % 8000).toInt
      val durMs = 100 + (i * 13) % 500
      val n = (rate * durMs / 1000L).toInt
      val samples = Array.tabulate(n)(k =>
        (((i * 31 + k * 17L) % 65536) - 32768).toShort)
      MediaFile(i, MediaMeta("audio", 0, 0, rate, durMs),
        MediaCodecs.encodeWav(rate, samples))
    case _ =>
      val w = (8 + (i * 5) % 24).toInt
      val h = (8 + (i * 3) % 24).toInt
      val fps = (5 + i % 25).toInt
      val nf = (4 + (i * 7) % 12).toInt
      val frames = Array.tabulate(nf)(f =>
        Array.tabulate(3 * w * h)(j => ((i + f * 11L + j * 7L) % 256).toByte))
      MediaFile(i, MediaMeta("video", w, h, 0, nf * 1000L / fps),
        MediaCodecs.encodeY4m(w, h, fps, 1, frames))
  }

  /** Decode → fixed-dim feature vector. REAL for PPM images (16-bin
    * luminance histogram), PCM16 WAV audio (16-window RMS envelope) and Y4M
    * video (luma histogram of the first frame) via MediaCodecs; formats
    * with no pure-JVM codec (JPEG/MP3/H.264) fall back to the deterministic
    * byte-level fallback. Plan shape (narrow map over binary, no shuffle)
    * is identical either way.
    */
  val FeatureDim = 16

  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val real = m.meta.kind match {
        case "image" => MediaCodecs.ppmLumaHistogram(m.media, FeatureDim)
        case "audio" => MediaCodecs.wavRmsWindows(m.media, FeatureDim)
        case _ =>
          // only the FIRST frame feeds the histogram — slice it via the
          // offset walk instead of decodeY4m, which would copy every frame
          // of the stream (N× per-row allocation for nothing)
          MediaCodecs.decodeY4mHeader(m.media).filter(_.frameLen > 0).flatMap {
            hdr =>
              MediaCodecs.y4mFrameOffsets(m.media, hdr).headOption.map { off =>
                MediaCodecs.y4mLumaHistogram(
                  java.util.Arrays.copyOfRange(m.media, off, off + hdr.frameLen),
                  hdr.w, hdr.h, FeatureDim)
              }
          }
      }
      MediaFeatures(m.doc_id, m.meta.kind, real.getOrElse(stubFeatures(m.media)))
    }
  }

  /** deterministic byte-level fallback for payloads whose codec is not in
    * this container (JPEG/MP3/H.264): keeps shape + determinism so the
    * pipeline stays testable end-to-end
    */
  private[multimodal] def stubFeatures(bytes: Array[Byte]): Array[Float] = {
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

  /** REAL frame sampling: parse the Y4M container (header + `FRAME\n`
    * markers), emit every Nth raw frame (planar YUV bytes) as
    * (doc_id, frame_idx, frame binary). Non-Y4M video payloads (no codec
    * in this container) produce no frames rather than fake ones. The frame
    * copy is lazy per offset — a sampled stream never materializes the
    * skipped frames.
    */
  def sampleFrames(media: Dataset[MediaFile], everyNth: Int): DataFrame = {
    // fail on the driver, not as an ArithmeticException inside a task
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      if (m.meta.kind != "video") Iterator.empty
      else MediaCodecs.decodeY4mHeader(m.media) match {
        case Some(hdr) if hdr.frameLen > 0 =>
          val offsets = MediaCodecs.y4mFrameOffsets(m.media, hdr)
          offsets.indices.iterator.filter(_ % everyNth == 0).map { f =>
            (m.doc_id, f, java.util.Arrays.copyOfRange(
              m.media, offsets(f), offsets(f) + hdr.frameLen))
          }
        case _ => Iterator.empty
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
