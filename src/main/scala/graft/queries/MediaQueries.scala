package graft.queries

import graft.multimodal.{MediaCodecs, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal driver query: REAL container decode (binary PPM, PCM16 WAV,
  * Y4M) over the oracle-replayable media table, aggregated to integer
  * per-kind stats that DuckDB recomputes arithmetically
  * (OracleSql.mediaStats). Every number below comes from PARSING the
  * binary payload — kind dispatch sniffs the container magic, dimensions
  * and rates come from the decoded headers, payload sums from the decoded
  * pixel/sample/frame bytes, and frame sampling walks the real `FRAME`
  * markers — so a decoder regression fails the hash compare loudly.
  *
  * Scale shape: the decode is one narrow typed map over the binary column
  * (no shuffle until the 3-group aggregate); there is no functions._
  * equivalent for container parsing, so the typed map is the legitimate
  * tier here (SURVEY §7.4 preference order).
  */
object MediaQueries {
  import Tables._

  /** every 2nd frame feeds the sampled-frame byte sum (the frame-sample
    * pipeline stage exercised inside the driver query)
    */
  val SampleEveryNth = 2

  def mediaStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // one media row per documents row: both sides derive the corpus size
    // from the same table, so the oracle scales with sfDir (count memoized
    // per (sfDir, JVM) — Bench re-runs the query, testdata is immutable)
    val rows = Tables.rowCount(spark, sfDir, "documents")
    val media = Multimodal.oracleTable(spark, rows,
      math.max(1, math.min(32, spark.sparkContext.defaultParallelism)))
    val per = media.map { m =>
      val b = m.media
      // container sniffing, not metadata trust: P6 / RIFF / YUV4MPEG2
      if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
        val (w, h, rgb) = MediaCodecs.decodePpm(b).get
        var s = 0L
        var j = 0
        while (j < rgb.length) { s += rgb(j) & 0xff; j += 1 }
        ("image", w.toLong, h.toLong, 0L, 0L, 0L, 0L, s)
      } else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' &&
          b(2) == 'F' && b(3) == 'F') {
        val (rate, samples) = MediaCodecs.decodeWav(b).get
        var s = 0L
        var k = 0
        // +32768 keeps the per-sample term non-negative so the DuckDB side
        // is a plain (i*31 + k*17) % 65536 — no signed-mod divergence
        while (k < samples.length) { s += samples(k) + 32768L; k += 1 }
        ("audio", 0L, 0L, rate.toLong, samples.length.toLong, 0L, 0L, s)
      } else {
        val hdr = MediaCodecs.decodeY4mHeader(b).get
        val offs = MediaCodecs.y4mFrameOffsets(b, hdr)
        var s = 0L
        var sampled = 0L
        var f = 0
        while (f < offs.length) {
          if (f % SampleEveryNth == 0) {
            sampled += 1
            var j = offs(f)
            val end = offs(f) + hdr.frameLen
            while (j < end) { s += b(j) & 0xff; j += 1 }
          }
          f += 1
        }
        ("video", hdr.w.toLong, hdr.h.toLong, 0L, 0L, offs.length.toLong,
          sampled, s)
      }
    }.toDF("kind", "w", "h", "rate", "nsamples", "nframes", "sampled", "psum")
    per.groupBy("kind").agg(
        count(lit(1)).as("n"),
        sum(col("w")).as("sum_w"),
        sum(col("h")).as("sum_h"),
        sum(col("rate")).as("sum_rate"),
        sum(col("nsamples")).as("sum_samples"),
        sum(col("nframes")).as("sum_frames"),
        sum(col("sampled")).as("frames_sampled"),
        sum(col("psum")).as("payload_sum"))
      .orderBy("kind")
  }
}
