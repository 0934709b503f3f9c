package graft.codec

import org.scalatest.funsuite.AnyFunSuite

class BlockFilterSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("UTF-8")

  private def buildOver(values: Array[Array[Byte]]): Array[Byte] = {
    val hashes = values.map(BlockFilter.hash64)
    BlockFilter.build(hashes, hashes.toSet.size)
  }

  test("no false negatives: every inserted value probes true") {
    val rng = new java.util.SplittableRandom(0xb10c)
    for (trial <- 1 to 20) {
      val n = 1 + rng.nextInt(5000)
      val values = Array.fill(n) {
        val len = rng.nextInt(64)
        val b = new Array[Byte](len)
        var i = 0
        while (i < len) { b(i) = rng.nextInt(256).toByte; i += 1 }
        b
      }
      val f = buildOver(values)
      values.foreach { v =>
        assert(BlockFilter.mayContain(f, v),
          s"false negative in trial $trial (n=$n)")
      }
    }
  }

  test("false-positive rate stays low (~1%, assert < 5%)") {
    val present = (0 until 10000).map(i => bytes(s"present-$i")).toArray
    val f = buildOver(present)
    val falsePos = (0 until 10000).count(i => BlockFilter.mayContain(f, bytes(s"absent-$i")))
    assert(falsePos < 500, s"$falsePos/10000 false positives")
    // size is ~1.25 bytes per distinct value, not per insert
    assert(f.length <= 10000 * 2, s"filter too large: ${f.length}")
  }

  test("duplicates do not inflate the filter") {
    val values = Array.fill(10000)(bytes("same-value"))
    val f = buildOver(values)
    assert(f.length == 32, s"1 distinct value must fit one 32-byte block, got ${f.length}")
    assert(BlockFilter.mayContain(f, bytes("same-value")))
  }

  test("deterministic: same input, byte-identical filter (resume-stable)") {
    val values = (0 until 1000).map(i => bytes(s"v$i")).toArray
    assert(java.util.Arrays.equals(buildOver(values), buildOver(values)))
  }

  test("offset-based probe matches the zero-offset probe") {
    val values = (0 until 500).map(i => bytes(s"k$i")).toArray
    val f = buildOver(values)
    val padded = new Array[Byte](7 + f.length + 3)
    System.arraycopy(f, 0, padded, 7, f.length)
    for (i <- 0 until 500) {
      val v = bytes(s"k$i")
      assert(BlockFilter.mayContain(padded, 7, f.length, v) ==
        BlockFilter.mayContain(f, v))
    }
  }

  test("empty or absent filter is conservative (true)") {
    assert(BlockFilter.mayContain(Array.emptyByteArray, bytes("x")))
  }
}
