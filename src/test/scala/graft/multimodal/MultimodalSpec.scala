package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-multimodal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("synthetic media table: schema, determinism, binary payloads") {
    spark.sparkContext.setLogLevel("WARN")
    val a = Multimodal.syntheticTable(spark, 500).collect().sortBy(_.doc_id)
    val b = Multimodal.syntheticTable(spark, 500).collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.zip(b).forall { case (x, y) =>
      x.doc_id == y.doc_id && x.meta == y.meta &&
        java.util.Arrays.equals(x.media, y.media)
    })
    assert(a.map(_.meta.kind).toSet == Set("image", "audio", "video"))
    assert(a.forall(_.media.length >= 256))
  }

  test("feature extraction: fixed dim, deterministic, no shuffle in the plan") {
    val media = Multimodal.syntheticTable(spark, 300)
    val feats = Multimodal.extractFeatures(media)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"narrow map must not shuffle:\n$plan")
    val rows = feats.collect()
    assert(rows.length == 300)
    assert(rows.forall(_.features.length == Multimodal.FeatureDim))
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (x, y) => x.features.sameElements(y.features) })
  }

  test("ppm codec round-trips and decodes the synthetic images") {
    val rgb = Array.tabulate(3 * 5 * 4)(i => (i * 7).toByte)
    val ppm = MediaCodecs.encodePpm(5, 4, rgb)
    val Some((w, h, back)) = MediaCodecs.decodePpm(ppm)
    assert(w == 5 && h == 4 && back.toSeq == rgb.toSeq)
    assert(MediaCodecs.decodePpm("not an image".getBytes).isEmpty)
    // comments + arbitrary whitespace per the PPM spec
    val weird = ("P6 # cmt\n # another\n 2\t1\n255\n" + "abcdef").getBytes("US-ASCII")
    assert(MediaCodecs.decodePpm(weird).exists { case (w2, h2, px) =>
      w2 == 2 && h2 == 1 && px.toSeq == "abcdef".getBytes.toSeq
    })
  }

  test("wav codec round-trips PCM16 samples") {
    val samples = Array.tabulate(1000)(k => (math.sin(k * 0.1) * 20000).toShort)
    val wav = MediaCodecs.encodeWav(16000, samples)
    val Some((rate, back)) = MediaCodecs.decodeWav(wav)
    assert(rate == 16000 && back.toSeq == samples.toSeq)
    assert(MediaCodecs.decodeWav(Array.fill[Byte](100)(3)).isEmpty)

    // odd-length chunk before fmt/data: RIFF pads to word alignment with a
    // byte NOT counted in the chunk length — real-world LIST/INFO chunks
    // are routinely odd-sized and must not misalign the walk
    val oddChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte]('a', 'b', 'c') ++ Array[Byte](0)
    val spliced = wav.take(12) ++ oddChunk ++ wav.drop(12)
    // patch the RIFF size to cover the inserted chunk
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val Some((rate2, back2)) = MediaCodecs.decodeWav(spliced)
    assert(rate2 == 16000 && back2.toSeq == samples.toSeq,
      "odd chunk misaligned the RIFF walk")
  }

  test("resize really resamples PPM pixels (nearest neighbor)") {
    val media = Multimodal.syntheticTable(spark, 200)
    val resized = Multimodal.resize(media, 32, 32).collect()
    val byId = media.collect().map(m => m.doc_id -> m).toMap
    resized.foreach { m =>
      if (m.meta.kind == "image") {
        assert(m.meta.width == 32 && m.meta.height == 32)
        val Some((w, h, px)) = MediaCodecs.decodePpm(m.media)
        assert(w == 32 && h == 32 && px.length == 3 * 32 * 32)
        // corner pixel is the source's corner pixel (nearest neighbor)
        val Some((_, _, src)) = MediaCodecs.decodePpm(byId(m.doc_id).media)
        assert(px(0) == src(0) && px(1) == src(1) && px(2) == src(2))
      } else assert(m.meta == byId(m.doc_id).meta)
    }
  }

  test("image/audio features come from REAL decodes (histogram/RMS ranges)") {
    val media = Multimodal.syntheticTable(spark, 300)
    val feats = Multimodal.extractFeatures(media).collect()
    val kinds = media.collect().map(m => m.doc_id -> m.meta.kind).toMap
    feats.foreach { f =>
      kinds(f.doc_id) match {
        case "image" => // histogram: non-negative, sums to ~1
          assert(f.features.forall(v => v >= 0f && v <= 1f))
          assert(math.abs(f.features.sum - 1f) < 1e-3)
        case "audio" => // RMS of a ±0.4-ish sine + noise
          assert(f.features.forall(v => v >= 0f && v <= 1f))
          assert(f.features.max > 0.05f)
        case _ =>
      }
    }
  }

  test("frame sampling decodes REAL Y4M frames bit-exactly, videos only") {
    val media = Multimodal.syntheticTable(spark, 200)
    val frames = Multimodal.sampleFrames(media, everyNth = 2)
    val byId = media.collect().map(m => m.doc_id -> m).toMap
    val got = frames.collect()
    assert(got.nonEmpty)
    assert(got.forall(r => byId(r.getLong(0)).meta.kind == "video"))
    assert(got.forall(_.getInt(1) % 2 == 0))
    // every sampled frame byte-equals the frame decoded directly from the
    // original Y4M payload, and has the exact C444 plane size
    got.foreach { r =>
      val m = byId(r.getLong(0))
      val Some((hdr, all)) = MediaCodecs.decodeY4m(m.media)
      assert(hdr.w == m.meta.width && hdr.h == m.meta.height)
      val frame = r.getAs[Array[Byte]](2)
      assert(frame.length == 3 * hdr.w * hdr.h)
      assert(java.util.Arrays.equals(frame, all(r.getInt(1))))
    }
  }

  test("y4m codec round-trips frames and tolerates frame params/colorspaces") {
    val rng = new java.util.SplittableRandom(7)
    val (w, h) = (12, 9)
    val frames = Array.fill(5) {
      val f = new Array[Byte](3 * w * h)
      rng.nextBytes(f)
      f
    }
    val y4m = MediaCodecs.encodeY4m(w, h, 25, 1, frames)
    val Some((hdr, back)) = MediaCodecs.decodeY4m(y4m)
    assert(hdr == MediaCodecs.Y4mHeader(12, 9, 25, 1, "C444", hdr.headerLen))
    assert(back.length == 5)
    back.zip(frames).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    // C420 frame sizing + FRAME parameter tolerance
    val c420 = ("YUV4MPEG2 W4 H4 F30:1 Ip A1:1 C420\n" +
      "FRAME Xextra\n" + "x" * 24 + "FRAME\n" + "y" * 24).getBytes("US-ASCII")
    val Some(h420) = MediaCodecs.decodeY4mHeader(c420)
    assert(h420.frameLen == 24)
    assert(MediaCodecs.y4mFrameOffsets(c420, h420).length == 2)
    // truncated tail frame is not emitted
    val trunc = java.util.Arrays.copyOf(c420, c420.length - 3)
    assert(MediaCodecs.y4mFrameOffsets(trunc, h420).length == 1)
    // non-Y4M payloads refuse cleanly
    assert(MediaCodecs.decodeY4mHeader("not a video".getBytes).isEmpty)
    // odd dimensions: chroma planes are CEIL(w/2) x CEIL(h/2) — W5 H4 C422
    // is Y=20 + 2*(3*4)=24 -> 44 (NOT 2*w*h=40), W5 H3 C420 is
    // 15 + 2*(3*2)=12 -> 27 (NOT 5*3*3/2=22)
    val Some(h422) = MediaCodecs.decodeY4mHeader(
      "YUV4MPEG2 W5 H4 C422\nFRAME\n".getBytes("US-ASCII"))
    assert(h422.frameLen == 44)
    val Some(h420odd) = MediaCodecs.decodeY4mHeader(
      "YUV4MPEG2 W5 H3 C420\nFRAME\n".getBytes("US-ASCII"))
    assert(h420odd.frameLen == 27)
    // and the offsets honor the corrected size: two full odd-dim frames
    val odd = ("YUV4MPEG2 W5 H4 C422\n" +
      "FRAME\n" + "a" * 44 + "FRAME\n" + "b" * 44).getBytes("US-ASCII")
    assert(MediaCodecs.y4mFrameOffsets(odd, h422).length == 2)
  }

  test("feature stats aggregates per kind") {
    val media = Multimodal.syntheticTable(spark, 300)
    val stats = Multimodal.featureStats(Multimodal.extractFeatures(media)).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(stats.map(_.getLong(1)).sum == 300)
  }
}
