package graft.engine

import graft.gen.DataGen
import graft.model.EncodedBlock
import org.apache.spark.sql.{Encoders, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Corrupt-block policy tests ≙ the reference's onBadLines fixtures
  * (FIXTURES.md §2.4: a corrupted payload must fail loudly under ERROR or
  * skip under WARN/SKIP).
  */
class BadBlocksSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-badblocks-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val cols = Seq("repo", "path", "commit", "lang", "content")

  private def corruptedBlocks() = {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = DataGen.table(spark, DataGen.GenConfig(rows = 2000, parts = 4)).toDF()
    val blocks = Encoder.encode(df, cols, Seq("repo", "path", "commit"),
      Encoder.EncodeConfig(numPartitions = 4, blockRows = 256)).collect()
    // flip bytes in one content block's payload
    val victimIdx = blocks.indexWhere(b => b.colName == "content" && b.data.length > 64)
    val victim = blocks(victimIdx)
    val corrupted = victim.data.clone()
    for (i <- 20 until 40) corrupted(i) = (corrupted(i) ^ 0x5a).toByte
    blocks(victimIdx) = victim.copy(data = corrupted)
    (spark.createDataset(blocks.toSeq)(Encoders.product[EncodedBlock]),
      blocks.length, victim.rowCount)
  }

  test("ERROR policy fails loudly naming the block") {
    val (ds, _, _) = corruptedBlocks()
    val e = intercept[org.apache.spark.SparkException] {
      Decoder.decode(ds, cols, Decoder.ErrorOnBadBlocks).count()
    }
    assert(e.getMessage.contains("undecodable block group") ||
      Option(e.getCause).exists(_.getMessage.contains("undecodable block group")))
  }

  test("SKIP policy drops exactly the corrupted block group") {
    val (ds, _, victimRows) = corruptedBlocks()
    val n = Decoder.decode(ds, cols, Decoder.SkipBadBlocks).count()
    assert(n == 2000 - victimRows)
  }
}
