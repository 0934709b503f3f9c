package graft.engine

import graft.gen.DataGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FilteredDecodeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-filtered-decode-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val cols = Seq("repo", "path", "commit", "lang", "content")

  test("decodeWhereEq returns exactly the filtered rows, bit-identical") {
    spark.sparkContext.setLogLevel("WARN")
    val df = DataGen.table(spark,
      DataGen.GenConfig(rows = 5000, parts = 8)).toDF().cache()
    val blocks = Encoder.encode(df, cols, Seq("repo", "path", "commit"),
      Encoder.EncodeConfig(numPartitions = 8, blockRows = 512)).cache()

    for (key <- Seq("lang" -> "scala", "repo" -> "org0/repo0", "lang" -> "no-such-lang")) {
      val (kc, v) = key
      val got = Decoder.decodeWhereEq(blocks, cols, kc, v)
      val expected = df.where(col(kc) === v)
      assert(got.count() == expected.count(), s"$kc=$v")
      assert(graft.verify.Sha256Check.mismatchGroups(expected, got, cols) == 0, s"$kc=$v")
    }
    blocks.unpersist(); df.unpersist()
  }

  test("decodeWhereEq late-materialization join has no forced broadcast") {
    // the hit list carries per-block row-index arrays; for low-selectivity
    // keys that is too big to force onto every executor — the plan must
    // leave the join strategy to size-based planning (no hint node)
    val df = DataGen.table(spark,
      DataGen.GenConfig(rows = 2000, parts = 4)).toDF()
    val blocks = Encoder.encode(df, cols, Seq("repo", "path", "commit"),
      Encoder.EncodeConfig(numPartitions = 4, blockRows = 512))
    val q = Decoder.decodeWhereEq(blocks, cols, "lang", "scala")
    val hints = q.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"late-materialization join must not force a strategy: $hints")
  }

  test("point lookup on a unique path touches few blocks") {
    val df = DataGen.table(spark,
      DataGen.GenConfig(rows = 5000, parts = 8)).toDF().cache()
    val somePath = df.select("path").orderBy("path").first().getString(0)
    val blocks = Encoder.encode(df, cols, Seq("repo", "path", "commit"),
      Encoder.EncodeConfig(numPartitions = 8, blockRows = 512)).cache()

    val got = Decoder.decodeWhereEq(blocks, cols, "path", somePath).collect()
    assert(got.length == 1 && got.head.getAs[String]("path") == somePath)

    // the min/max-prefix predicate must prune most path blocks up front
    val totalPathBlocks = blocks.filter(col("colName") === "path").count()
    val survivors = blocks.filter(col("colName") === "path" &&
      col("minPrefix") <= lit(somePath.take(24)) &&
      col("maxPrefix") >= lit(somePath.take(24))).count()
    assert(survivors < totalPathBlocks,
      s"pruning had no effect: $survivors of $totalPathBlocks")
    blocks.unpersist(); df.unpersist()
  }

  test("single-column projection decode matches and prunes the shuffle") {
    val df = DataGen.table(spark,
      DataGen.GenConfig(rows = 3000, parts = 4)).toDF().cache()
    val blocks = Encoder.encode(df, cols, Seq("repo", "path", "commit"),
      Encoder.EncodeConfig(numPartitions = 4)).cache()
    val langOnly = Decoder.decode(blocks, Seq("lang"))
    assert(langOnly.columns.toSeq == Seq("lang"))
    val got = langOnly.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    blocks.unpersist(); df.unpersist()
  }

  test("prefix pruning is sound when prefixes cut at different lengths") {
    // the block max is >24 chars with an astral char AT index 23, so its
    // stored maxPrefix cuts at 23 chars (surrogate-pair safety); the probe
    // value is 24 chars ("a"*23 + "b") and LESS than max in UTF-8 order.
    // A naive maxPrefix >= probePrefix comparison ("a"*23 < "a"*23+"b")
    // would prune the block that holds the match — rows would vanish.
    import spark.implicits._
    val astral = new String(Character.toChars(0x1F600)) // 😀 > 'b' in UTF-8
    val matchVal = "a" * 23 + "b"
    val maxVal = "a" * 23 + astral + "tail"
    val df = Seq(
      (matchVal, "p1", "c1", "scala", "body-1"),
      (maxVal, "p2", "c2", "scala", "body-2"),
      ("a" * 10, "p3", "c3", "java", "body-3"))
      .toDF("repo", "path", "commit", "lang", "content")
    val blocks = Encoder.encode(df, cols, Seq("repo", "path", "commit"),
      Encoder.EncodeConfig(numPartitions = 1, blockRows = 512)).cache()
    // precondition: the stored prefix really is the 23-char cut
    val maxPrefix = blocks.filter(col("colName") === "repo")
      .select("maxPrefix").first().getString(0)
    assert(maxPrefix == "a" * 23, s"expected 23-char cut, got ${maxPrefix.length}")
    val got = Decoder.decodeWhereEq(blocks, cols, "repo", matchVal).collect()
    assert(got.length == 1 && got.head.getAs[String]("content") == "body-1",
      s"prefix pruning dropped the matching row (got ${got.length} rows)")
    blocks.unpersist()
  }

  test("mayContain prunes dict and FoR blocks without decode") {
    import graft.codec._
    def b(s: String) = s.getBytes("UTF-8")
    val dictBlock = BlockCodec.encodeBlock("c", 0, 0,
      Array(b("aa"), b("bb"), b("cc"), b("bb")), DictCodec)
    assert(BlockCodec.mayContain(dictBlock, b("bb")))
    assert(!BlockCodec.mayContain(dictBlock, b("zz")))
    assert(!BlockCodec.mayContain(dictBlock, b("ab")))

    val forBlock = BlockCodec.encodeBlock("c", 0, 0,
      Array(b("100"), b("150"), b("199")), ForLongCodec)
    assert(BlockCodec.mayContain(forBlock, b("150")))
    assert(BlockCodec.mayContain(forBlock, b("142"))) // in range: conservative yes
    assert(!BlockCodec.mayContain(forBlock, b("99")))
    assert(!BlockCodec.mayContain(forBlock, b("500")))
    assert(!BlockCodec.mayContain(forBlock, b("abc")))
  }
}
