package graft.engine

import graft.gen.DataGen
import graft.model.EncodedBlock
import graft.verify.{Sha256Check, SizeBar}
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end engine tests, mapping the reference's fullconversion
  * round-trip suite (reference: avro/infer/fullconversion/
  * FullIonConversionAbstractTest.java:21-158) onto the sha256 invariant,
  * plus the resume / skew / size-bar tests from SURVEY.md §5.
  */
class EngineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-engine-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val cols = Seq("repo", "path", "commit", "lang", "content")
  private val sortKeys = Seq("repo", "path", "commit")
  private def cfg = Encoder.EncodeConfig(numPartitions = 8, blockRows = 1024)

  private def genDf(rows: Long, zipfS: Double = 1.1, repos: Int = 50) = {
    spark.sparkContext.setLogLevel("WARN")
    DataGen.table(spark, DataGen.GenConfig(
      rows = rows, repos = repos, parts = 8, zipfS = zipfS)).toDF()
  }

  test("encode -> decode round-trips the generated table bit-identical") {
    val df = genDf(5000).cache()
    val blocks = Encoder.encode(df, cols, sortKeys, cfg)
    val decoded = Decoder.decode(blocks, cols)
    assert(decoded.count() == 5000)
    assert(Sha256Check.mismatchGroups(df, decoded, cols) == 0)
  }

  test("nulls survive the round-trip") {
    val df = genDf(2000)
      .withColumn("lang", when(col("path").endsWith(".py"), lit(null)).otherwise(col("lang")))
      .withColumn("content", when(length(col("content")) % 7 === 0, lit(null)).otherwise(col("content")))
      .cache()
    assert(df.where(col("lang").isNull).count() > 0)
    val blocks = Encoder.encode(df, cols, sortKeys, cfg)
    val decoded = Decoder.decode(blocks, cols)
    assert(Sha256Check.mismatchGroups(df, decoded, cols) == 0)
  }

  test("generated content respects the 64 KiB fixture envelope exactly") {
    // FIXTURES §1: content is 200 B–64 KiB with a near-max edge row every
    // 10007 rows — genContent appends whole lines, so without the trailing
    // truncation the edge row overshot the documented cap by up to a line
    val edge = graft.gen.DataGen.row(3L, graft.gen.DataGen.GenConfig(rows = 10))
    assert(edge.content.length == 64 * 1024,
      s"near-max row must sit exactly at the cap, got ${edge.content.length}")
    (0L until 50L).foreach { i =>
      val r = graft.gen.DataGen.row(i, graft.gen.DataGen.GenConfig(rows = 50))
      assert(r.content.length <= 64 * 1024)
    }
  }

  test("every codec family appears across the generated table's columns") {
    val df = genDf(5000)
    val blocks = Encoder.encode(df, cols, sortKeys, cfg)
    val byCol = blocks.groupBy(col("colName"))
      .agg(collect_set(col("codecId")).as("codecs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Byte](1).toSet)
      .toMap
    // content is high-entropy long text → fsst; lang/repo are tiny-ndv →
    // dict / rle / dict+rle hybrid depending on the run structure
    val dictish = Set(graft.model.CodecId.Dict, graft.model.CodecId.Rle,
      graft.model.CodecId.DictRle)
    assert(byCol("content").contains(graft.model.CodecId.Fsst))
    assert(byCol("lang").subsetOf(dictish))
    assert(byCol("repo").subsetOf(dictish))
  }

  test("resume skips committed partitions and completes partial runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-resume").toString
    val df = genDf(4000).cache()
    val r1 = Checkpoint.encodeResumable(df, cols, sortKeys, cfg, dir, "t1")
    assert(r1.skippedParts == 0)

    // full re-run: everything skipped, output unchanged
    val r2 = Checkpoint.encodeResumable(df, cols, sortKeys, cfg, dir, "t1")
    assert(r2.skippedParts == r1.completedParts)
    assert(r2.encodedBytes == r1.encodedBytes)

    // simulate a crash that lost some partitions: drop their block dirs and
    // manifest entries, then resume — only the missing ones re-encode
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = Checkpoint.readManifest(spark, dir).collect()
    val keepParts = manifest.map(_.partId).distinct.sorted.take(3).toSet
    manifest.map(_.partId).distinct.filterNot(keepParts).foreach { pid =>
      fs.delete(new org.apache.hadoop.fs.Path(s"${Checkpoint.blocksDir(dir)}/partId=$pid"), true)
    }
    val keptDf = spark.createDataset(manifest.filter(m => keepParts(m.partId)).toSeq)(
      Encoders.product[graft.model.ManifestEntry]).toDF()
    val tmp = s"$dir/manifest-rewrite"
    keptDf.write.mode("overwrite").parquet(tmp)
    fs.delete(new org.apache.hadoop.fs.Path(Checkpoint.manifestDir(dir)), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(Checkpoint.manifestDir(dir)))
    // faithful crash state: a run that died mid-encode never wrote the
    // completeness claim (it lands only after the full manifest commit) —
    // leaving it here would be manifest surgery outside the write contract
    fs.delete(new org.apache.hadoop.fs.Path(Checkpoint.completeFile(dir)), false)

    val r3 = Checkpoint.encodeResumable(df, cols, sortKeys, cfg, dir, "t1")
    assert(r3.skippedParts == keepParts.size)
    assert(r3.completedParts == r1.completedParts)

    val blocks = spark.read.parquet(Checkpoint.blocksDir(dir))
      .as(Encoders.product[EncodedBlock])
    val decoded = Decoder.decode(blocks, cols)
    assert(decoded.count() == 4000)
    assert(Sha256Check.mismatchGroups(df, decoded, cols) == 0)
  }

  test("changed fingerprint invalidates prior work") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fp").toString
    val df = genDf(1000).cache()
    Checkpoint.encodeResumable(df, cols, sortKeys, cfg, dir, "fp-a")
    val r = Checkpoint.encodeResumable(df, cols, sortKeys, cfg, dir, "fp-b")
    assert(r.skippedParts == 0) // nothing reusable under the new fingerprint
    assert(r.rowCount == 1000)
  }

  test("salting bounds partition size under heavy repo skew") {
    // one repo ≈ 50%+ of rows (zipf s=1.8 over 10 repos)
    val df = genDf(8000, zipfS = 1.8, repos = 10)
    val top = df.groupBy("repo").count().orderBy(desc("count")).first()
    assert(top.getLong(1) > 3000, s"fixture not skewed enough: $top")
    val partitioned = Encoder.partitionInput(df, cols, sortKeys, cfg)
    val sizes = partitioned.mapPartitions(it => Iterator.single(it.size))(Encoders.scalaInt)
      .collect()
    val target = 8000 / cfg.numPartitions
    assert(sizes.max <= target * 3,
      s"skew not bounded: max=${sizes.max} target=$target sizes=${sizes.mkString(",")}")
  }

  test("encoded size beats Parquet-snappy and Avro-deflate baselines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sizebar").toString
    val df = genDf(8000).cache()
    val blocks = Encoder.encode(df, cols, sortKeys, cfg).cache()
    val ours = blocks.agg(sum(col("encodedBytes"))).first().getLong(0)
    val parquetSnappy = SizeBar.parquetSnappyBytes(df, dir)
    val avroDeflate = SizeBar.avroDeflateBytes(df)
    info(s"ours=$ours parquet-snappy=$parquetSnappy avro-deflate=$avroDeflate")
    assert(ours <= parquetSnappy, s"ours=$ours > parquet-snappy=$parquetSnappy")
    assert(ours <= avroDeflate, s"ours=$ours > avro-deflate=$avroDeflate")
    blocks.unpersist()
  }

  test("blocks respect the row/byte cut and reconstruct in order") {
    val df = genDf(3000)
    val blocks = Encoder.encode(df, cols, sortKeys,
      cfg.copy(blockRows = 256)).collect()
    assert(blocks.forall(_.rowCount <= 256))
    // each (partId, blockIdx) must have exactly one block per column
    blocks.groupBy(b => (b.partId, b.blockIdx)).foreach { case (_, bs) =>
      assert(bs.map(_.colName).toSet == cols.toSet)
      assert(bs.map(_.rowCount).toSet.size == 1)
    }
  }
}
