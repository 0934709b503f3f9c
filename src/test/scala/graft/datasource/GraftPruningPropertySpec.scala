package graft.datasource

import graft.codec.{DictCodec, PlainCodec}
import graft.engine.BlockCodec
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the block-skip rules: across thousands of random
  * blocks (unicode values incl. supplementary chars that force the 23-char
  * prefix cut, nulls, values longer than the 24-char prefix), a predicate
  * the pruner rejects must have ZERO matching values in the block —
  * pruning may only skip, never drop. The prefixes come from the REAL
  * encode path (BlockCodec.encodeBlock), not a reimplementation.
  */
class GraftPruningPropertySpec extends AnyFunSuite {

  private val rng = new java.util.SplittableRandom(0x5eed)

  private def randString(): String = {
    val n = rng.nextInt(40)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      val cp = rng.nextInt(10) match {
        case 0 => 0x1F600 + rng.nextInt(16) // supplementary (surrogate pair)
        case 1 => 0x4E00 + rng.nextInt(64) // 3-byte UTF-8
        case _ => 'a' + rng.nextInt(4) // dense collisions
      }
      sb.appendAll(Character.toChars(cp))
      i += 1
    }
    sb.toString
  }

  private def cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  /** predicate semantics at the BYTE level, like the engine: values and
    * patterns live as UTF-8 (UTF8String in Spark, raw bytes in blocks), so
    * e.g. a lone surrogate in a pattern compares as its UTF-8 replacement
    * byte — Java's char-level String.startsWith would disagree with what
    * Spark's residual filter actually evaluates
    */
  private def matches(pred: GraftPred, v: String): Boolean = {
    def b(s: String) = s.getBytes("UTF-8")
    def eqB(a: String, c: String) = java.util.Arrays.equals(b(a), b(c))
    def startsB(a: String, p: String) = {
      val ab = b(a); val pb = b(p)
      ab.length >= pb.length &&
        java.util.Arrays.equals(ab, 0, pb.length, pb, 0, pb.length)
    }
    pred.kind match {
      case "eq" => v != null && eqB(v, pred.value)
      case "lower" => v != null && cmp(v, pred.value) >= 0
      case "upper" => v != null && cmp(v, pred.value) <= 0
      case "prefix" => v != null && startsB(v, pred.value)
      case "in" => v != null && pred.values.exists(eqB(v, _))
      case "notnull" => v != null
    }
  }

  test("random blocks: a pruned block never contains a matching value") {
    var pruned = 0
    var checked = 0
    for (_ <- 1 to 4000) {
      val n = 1 + rng.nextInt(30)
      val values: Array[String] = Array.fill(n)(
        if (rng.nextInt(10) == 0) null else randString())
      val bytes = values.map(v => if (v == null) null else v.getBytes("UTF-8"))
      val block = BlockCodec.encodeBlock("c", 0, 0, bytes, PlainCodec)

      def probeValue(): String = rng.nextInt(3) match {
        case 0 if values.exists(_ != null) =>
          Iterator.continually(values(rng.nextInt(n))).find(_ != null).get
        case 1 if values.exists(_ != null) =>
          val v = Iterator.continually(values(rng.nextInt(n))).find(_ != null).get
          v.substring(0, rng.nextInt(v.length + 1))
        case _ => randString()
      }
      val preds = Seq(
        GraftPred("eq", "c", probeValue()),
        GraftPred("lower", "c", probeValue()),
        GraftPred("upper", "c", probeValue()),
        GraftPred("prefix", "c", probeValue()),
        GraftPred("in", "c", null, Seq.fill(1 + rng.nextInt(3))(probeValue())),
        GraftPred("notnull", "c", null))
      preds.foreach { p =>
        checked += 1
        if (!GraftPruning.blockMayMatch(p, block.minPrefix, block.maxPrefix)) {
          pruned += 1
          values.foreach(v => assert(!matches(p, v),
            s"pruned a matching value: pred=$p v=[$v] " +
              s"pMin=[${block.minPrefix}] pMax=[${block.maxPrefix}]"))
        }
      }
    }
    // the rules must actually fire sometimes, or this test proves nothing
    assert(pruned > 500, s"only $pruned/$checked predicates pruned")
  }

  test("membership filter: a rejecting plain/FSST/hex block never holds the value") {
    var rejected = 0
    for (_ <- 1 to 400) {
      // >= FilterMinValues so the split-block bloom is actually built
      val n = BlockCodec.FilterMinValues + rng.nextInt(200)
      val values = Array.fill(n)(randString() + rng.nextInt(1000))
      val bytes = values.map(_.getBytes("UTF-8"))
      val block = BlockCodec.encodeBlock("c", 0, 0, bytes, PlainCodec)
      // present values may NEVER be rejected (a false negative drops rows)
      values.foreach { v =>
        assert(BlockCodec.mayContain(block, v.getBytes("UTF-8")),
          s"filter rejected a present value [$v]")
      }
      val probe = randString() + "-absent-" + rng.nextInt(1000000)
      if (!BlockCodec.mayContain(block, probe.getBytes("UTF-8"))) {
        rejected += 1
        assert(!values.contains(probe))
      }
    }
    // ~99% of absent probes must actually prune, or the filter is dead weight
    assert(rejected > 300, s"only $rejected/400 absent probes rejected")
  }

  test("mayContainAny agrees with per-value probes on every codec") {
    import graft.codec.{ForLongCodec, HexPackCodec}
    val rng2 = new java.util.SplittableRandom(0xacc0)
    for (trial <- 1 to 300) {
      val n = 2 + rng2.nextInt(80)
      val (values, codec) = rng2.nextInt(4) match {
        case 0 => // low-ndv strings -> dict
          val pool = Array.fill(3)(randString())
          (Array.fill(n)(pool(rng2.nextInt(3))), DictCodec)
        case 1 => // canonical longs -> FoR
          (Array.fill(n)((100 + rng2.nextInt(1000)).toString), ForLongCodec)
        case 2 => // uniform hex -> hexpack (filter-eligible)
          (Array.fill(n)(f"${rng2.nextLong() & 0xffffffffL}%08x"), HexPackCodec)
        case _ => (Array.fill(n)(randString() + rng2.nextInt(500)), PlainCodec)
      }
      val block = BlockCodec.encodeBlock("c", 0, 0,
        values.map(_.getBytes("UTF-8")), codec)
      val probes: Array[Array[Byte]] = Array.fill(1 + rng2.nextInt(6)) {
        (if (rng2.nextBoolean()) values(rng2.nextInt(n))
         else randString() + "-x" + rng2.nextInt(100)).getBytes("UTF-8")
      }
      val batched = BlockCodec.mayContainAny(block, probes)
      val perValue = probes.exists(BlockCodec.mayContain(block, _))
      assert(batched == perValue,
        s"trial $trial codec=${codec.id}: batched=$batched perValue=$perValue")
    }
  }

  test("dict mayContain: a rejecting block never holds the probed value") {
    var rejected = 0
    for (_ <- 1 to 1500) {
      val n = 2 + rng.nextInt(20)
      // low-ndv pool so DictCodec accepts and probes often hit/miss close
      val pool = Array.fill(4)(randString())
      val values = Array.fill(n)(pool(rng.nextInt(pool.length)))
      val bytes = values.map(_.getBytes("UTF-8"))
      val block = BlockCodec.encodeBlock("c", 0, 0, bytes, DictCodec)
      val probe =
        if (rng.nextBoolean()) values(rng.nextInt(n)) else randString()
      if (!BlockCodec.mayContain(block, probe.getBytes("UTF-8"))) {
        rejected += 1
        assert(!values.contains(probe),
          s"mayContain rejected a present value [$probe]")
      }
    }
    assert(rejected > 200, s"only $rejected probes rejected")
  }
}
