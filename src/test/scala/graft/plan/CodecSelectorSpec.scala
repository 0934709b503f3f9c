package graft.plan

import graft.codec._
import graft.model.ColStats
import graft.stats.BlockStats
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class CodecSelectorSpec extends AnyFunSuite {

  private def stats(
      count: Long = 1000,
      nulls: Long = 0,
      ndv: Long = 1000,
      ndvExact: Boolean = true,
      totalBytes: Long = 30000,
      minLen: Int = 10,
      maxLen: Int = 50,
      maxRun: Int = 1,
      nRuns: Long = 1000,
      allLong: Boolean = false,
      minLong: Long = 0,
      maxLong: Long = 0,
      allHex: Boolean = false,
      hexLen: Int = -1) =
    ColStats("c", 0, count, nulls, ndv, ndvExact, totalBytes, minLen, maxLen,
      maxRun, nRuns, allLong, minLong, maxLong, allHex, hexLen)

  test("canonical longs with packable range -> FoR") {
    assert(CodecSelector.select(stats(allLong = true, minLong = 5, maxLong = 9999)) == ForLongCodec)
  }

  test("canonical longs with overflowing range -> not FoR") {
    val s = stats(allLong = true, minLong = Long.MinValue, maxLong = Long.MaxValue)
    assert(CodecSelector.select(s) != ForLongCodec)
  }

  test("low-ndv long runs -> Dict+RLE hybrid") {
    assert(CodecSelector.select(stats(ndv = 10, maxRun = 500, nRuns = 20)) == DictRleCodec)
  }

  test("high-ndv runs (dict unprofitable) -> RLE") {
    // nearly every value distinct: the dict would store them all anyway
    assert(CodecSelector.select(stats(
      ndv = 900, maxRun = 4, nRuns = 250, totalBytes = 30000)) == RleCodec)
  }

  test("low cardinality without runs -> Dict") {
    assert(CodecSelector.select(stats(ndv = 20, nRuns = 990)) == DictCodec)
  }

  test("unique hex strings -> HexPack") {
    assert(CodecSelector.select(stats(
      ndv = 1000, minLen = 40, maxLen = 40, totalBytes = 40000,
      allHex = true, hexLen = 40)) == HexPackCodec)
  }

  test("long high-entropy text -> FSST") {
    assert(CodecSelector.select(stats(
      ndv = 1000, minLen = 200, maxLen = 4000, totalBytes = 2000000)) == Fsst)
  }

  test("short unique strings -> Plain") {
    assert(CodecSelector.select(stats(
      ndv = 1000, minLen = 3, maxLen = 12, totalBytes = 8000)) == PlainCodec)
  }

  test("all-null column -> Plain") {
    assert(CodecSelector.select(stats(count = 100, nulls = 100, ndv = 0)) == PlainCodec)
  }

  test("BlockStats measures what the selector needs") {
    def b(s: String) = s.getBytes(UTF_8)
    val values: Array[Array[Byte]] =
      Array(b("5"), b("5"), b("5"), b("42"), null, b("-3"), b("7"))
    val s = BlockStats.compute("c", 0, values)
    assert(s.count == 7 && s.nulls == 1)
    assert(s.ndv == 4 && s.ndvIsExact)
    assert(s.maxRun == 3)
    assert(s.allLongCanonical && s.minLong == -3 && s.maxLong == 42)
    assert(!s.allHex)
    assert(s.minLen == 1 && s.maxLen == 2)

    val hex = Array(b("00ff"), b("abcd"), b("1234"))
    val hs = BlockStats.compute("c", 0, hex)
    assert(hs.allHex && hs.hexLen == 4 && !hs.allLongCanonical)

    val mixedHexLen = Array(b("00ff"), b("abcdef"))
    assert(BlockStats.compute("c", 0, mixedHexLen).hexLen == -1)
  }
}
