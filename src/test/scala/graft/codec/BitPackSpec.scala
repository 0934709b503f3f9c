package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import java.util.SplittableRandom

class BitPackSpec extends AnyFunSuite {

  test("width") {
    assert(BitPack.width(0) == 0)
    assert(BitPack.width(1) == 1)
    assert(BitPack.width(2) == 2)
    assert(BitPack.width(255) == 8)
    assert(BitPack.width(256) == 9)
    assert(BitPack.width(Long.MaxValue) == 63)
  }

  test("round-trips every width 0..64") {
    val rng = new SplittableRandom(42)
    for (w <- 0 to 64; n <- Seq(0, 1, 7, 64, 1001)) {
      val mask = if (w == 64) -1L else (1L << w) - 1L
      val vals = Array.fill(n)(rng.nextLong() & mask)
      if (w == 0) java.util.Arrays.fill(vals, 0L)
      val packed = BitPack.pack(vals, w)
      assert(packed.length == BitPack.packedBytes(n, w))
      val out = BitPack.unpack(packed, w, n)
      assert(out.sameElements(vals), s"w=$w n=$n")
    }
  }

  test("varint/zigzag round-trip") {
    val rng = new SplittableRandom(7)
    val w = new ByteWriter()
    val vals = Array.fill(2000)(rng.nextLong() >> rng.nextInt(64)) ++
      Array(0L, 1L, -1L, Long.MaxValue, Long.MinValue)
    vals.foreach(w.writeZigZag)
    vals.foreach(v => w.writeVarLong(v & Long.MaxValue))
    val r = new ByteReader(w.result())
    vals.foreach(v => assert(r.readZigZag() == v))
    vals.foreach(v => assert(r.readVarLong() == (v & Long.MaxValue)))
    assert(!r.hasRemaining)
  }
}
