package graft.engine

import graft.codec.PlainCodec
import graft.model.EncodedBlock
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Encoders, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Resume-path safety: encodeResumable must never destroy data it did not
  * itself leave as crash debris, must refuse foreign-format stores BEFORE
  * cleaning, must survive zero-row inputs, and must fast-path a complete
  * store even when some hash partitions are empty. Plus the decode-side
  * group-arity guard (columns of one row group disagreeing on row count).
  */
class CheckpointSafetySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-checkpoint-safety-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private val cols = Seq("repo", "path", "content")
  private val keys = Seq("repo", "path")
  private def cfg = Encoder.EncodeConfig(numPartitions = 8, blockRows = 64)

  private def smallDf = {
    import spark.implicits._
    // 2 distinct repartition keys over 8 partitions => most partitions empty
    (0 until 200).map(i => (s"r${i % 2}", s"p$i", s"content $i"))
      .toDF("repo", "path", "content")
  }

  test("refuses a manifest-less store with committed blocks (DSv2 contract)") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = tmpDir("graft-refuse-dsv2")
    Checkpoint.encodeResumable(smallDf, cols, keys, cfg, dir, "fp-a")
    // simulate the DSv2 append contract: manifest + completeness claim die
    fs.delete(new Path(Checkpoint.manifestDir(dir)), true)
    fs.delete(new Path(Checkpoint.completeFile(dir)), false)
    val before = fs.listStatus(new Path(Checkpoint.blocksDir(dir)))
      .count(_.getPath.getName.startsWith("partId="))
    assert(before > 0)
    val e = intercept[IllegalStateException] {
      Checkpoint.encodeResumable(smallDf, cols, keys, cfg, dir, "fp-a")
    }
    assert(e.getMessage.contains("no Checkpoint manifest"))
    val after = fs.listStatus(new Path(Checkpoint.blocksDir(dir)))
      .count(_.getPath.getName.startsWith("partId="))
    assert(after == before, "refusal must leave every block dir untouched")
  }

  test("crash debris (in-progress marker) is still cleaned and re-encoded") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = tmpDir("graft-crash-resume")
    Checkpoint.encodeResumable(smallDf, cols, keys, cfg, dir, "fp-b")
    // simulate a crash mid-first-run: manifest never committed, marker left
    fs.delete(new Path(Checkpoint.manifestDir(dir)), true)
    fs.delete(new Path(Checkpoint.completeFile(dir)), false)
    val marker = new Path(Checkpoint.inProgressFile(dir))
    val out = fs.create(marker, true)
    try out.write("fp".getBytes("UTF-8")) finally out.close()
    val r = Checkpoint.encodeResumable(smallDf, cols, keys, cfg, dir, "fp-b")
    assert(r.rowCount == 200, s"re-encode after crash, got ${r.rowCount}")
    assert(!fs.exists(marker), "in-progress marker must clear on success")
    assert(fs.exists(new Path(Checkpoint.completeFile(dir))))
  }

  test("pre-v2 store is refused with its blocks intact, not wiped") {
    val dir = tmpDir("graft-refuse-prev2")
    // a store shape from before _format.json: block parquet, no marker
    val legacy = new Path(s"${Checkpoint.blocksDir(dir)}/partId=0/part-0.parquet")
    val out = fs.create(legacy, true)
    try out.write("not really parquet".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalStateException] {
      Checkpoint.encodeResumable(smallDf, cols, keys, cfg, dir, "fp-c")
    }
    assert(e.getMessage.contains("_format.json"),
      s"must be the loud format refusal, was: ${e.getMessage}")
    assert(fs.exists(legacy), "refusal must fire BEFORE any cleaning")
  }

  test("zero-row input commits an empty store instead of crashing") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = tmpDir("graft-empty-encode")
    val empty = smallDf.filter(org.apache.spark.sql.functions.col("repo") === "nope")
    val r1 = Checkpoint.encodeResumable(empty, cols, keys, cfg, dir, "fp-d")
    assert(r1.rowCount == 0 && r1.rawBytes == 0 && r1.encodedBytes == 0)
    // and the empty store resumes as a no-op, not a crash
    val r2 = Checkpoint.encodeResumable(empty, cols, keys, cfg, dir, "fp-d")
    assert(r2.rowCount == 0)
  }

  test("complete store fast-paths even with empty hash partitions") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = tmpDir("graft-fastpath")
    // 2 distinct keys over 8 partitions: with NO salting, at most 2
    // partitions get rows, so the manifest alone can never prove
    // completeness — only the marker can. Pre-commit an EMPTY skew plan
    // under the right base fingerprint (both keys are heavy at this size
    // and would otherwise be salted across every partition).
    val baseFp = Checkpoint.fingerprint("fp-e", cols, keys, cfg)
    val planFile = new Path(Checkpoint.skewPlanFile(dir))
    val pout = fs.create(planFile, true)
    try pout.write(baseFp.getBytes("UTF-8")) finally pout.close()
    val r1 = Checkpoint.encodeResumable(smallDf, cols, keys, cfg, dir, "fp-e")
    assert(r1.completedParts < cfg.numPartitions,
      "test premise: some hash partitions must be empty")
    assert(fs.exists(new Path(Checkpoint.completeFile(dir))))
    // canary: the fast path must not re-enter cleanUncommitted
    val canary = new Path(s"${Checkpoint.blocksDir(dir)}/partId=99/stray.txt")
    val out = fs.create(canary, true)
    try out.write("x".getBytes("UTF-8")) finally out.close()
    val r2 = Checkpoint.encodeResumable(smallDf, cols, keys, cfg, dir, "fp-e")
    assert(r2.rowCount == r1.rowCount && r2.encodedBytes == r1.encodedBytes)
    assert(fs.exists(canary), "fully-resumed run must not clean or re-encode")
    // without the marker the pre-marker fallback (exhaustive entry check)
    // cannot engage here, so the slow path runs and reaps the stray dir
    fs.delete(new Path(Checkpoint.completeFile(dir)), false)
    val r3 = Checkpoint.encodeResumable(smallDf, cols, keys, cfg, dir, "fp-e")
    assert(r3.rowCount == r1.rowCount && r3.encodedBytes == r1.encodedBytes)
    assert(!fs.exists(canary), "slow path must clean uncommitted debris")
    assert(fs.exists(new Path(Checkpoint.completeFile(dir))),
      "slow path must re-assert completeness after commit")
  }

  test("row-count mismatch inside a block group routes through the policy") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (0 until 100).map(i => (s"k$i", s"v$i")).toDF("a", "b")
    val blocks = Encoder.encode(df, Seq("a", "b"), Seq("a"),
      Encoder.EncodeConfig(numPartitions = 2, blockRows = 1000)).collect()
    val victimIdx = blocks.indexWhere(_.colName == "b")
    val victim = blocks(victimIdx)
    // same (partId, blockIdx, colName) but FEWER rows than its group mates
    val vals = (0 until (victim.rowCount.toInt - 3))
      .map(i => s"v$i".getBytes("UTF-8")).toArray
    blocks(victimIdx) = BlockCodec.encodeBlock(
      victim.colName, victim.partId, victim.blockIdx, vals, PlainCodec)
    val ds = spark.createDataset(blocks.toSeq)(Encoders.product[EncodedBlock])
    val total = blocks.filter(_.colName == "a").map(_.rowCount).sum
    // SKIP: the whole corrupt group drops, nothing throws lazily
    val n = Decoder.decode(ds, Seq("a", "b"), Decoder.SkipBadBlocks).count()
    val aRowsOfVictimGroup = blocks.find(b =>
      b.colName == "a" && b.partId == victim.partId &&
        b.blockIdx == victim.blockIdx).get.rowCount
    assert(n == total - aRowsOfVictimGroup,
      s"skip must drop exactly the mismatched group: $n of $total")
    // ERROR: fails loudly, not with a lazy ArrayIndexOutOfBounds
    val e = intercept[org.apache.spark.SparkException] {
      Decoder.decode(ds, Seq("a", "b"), Decoder.ErrorOnBadBlocks).count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("undecodable block group") || msg.contains("corrupt group"))
  }
}
