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

  test("resize rescales image metadata and payload only") {
    val media = Multimodal.syntheticTable(spark, 200)
    val resized = Multimodal.resize(media, 32, 32).collect()
    val byId = media.collect().map(m => m.doc_id -> m).toMap
    resized.foreach { m =>
      if (m.meta.kind == "image") {
        assert(m.meta.width == 32 && m.meta.height == 32)
        assert(m.media.length <= byId(m.doc_id).media.length)
      } else assert(m.meta == byId(m.doc_id).meta)
    }
  }

  test("frame sampling emits every Nth chunk for videos only") {
    val media = Multimodal.syntheticTable(spark, 200)
    val frames = Multimodal.sampleFrames(media, everyNth = 2)
    val kinds = media.collect().map(m => m.doc_id -> m.meta.kind).toMap
    val got = frames.collect()
    assert(got.nonEmpty)
    assert(got.forall(r => kinds(r.getLong(0)) == "video"))
    assert(got.forall(_.getAs[Array[Byte]](2).length == 128))
    assert(got.forall(_.getInt(1) % 2 == 0))
  }

  test("feature stats aggregates per kind") {
    val media = Multimodal.syntheticTable(spark, 300)
    val stats = Multimodal.featureStats(Multimodal.extractFeatures(media)).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(stats.map(_.getLong(1)).sum == 300)
  }
}
