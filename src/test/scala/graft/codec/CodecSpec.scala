package graft.codec

import graft.model.CodecId
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import java.util.SplittableRandom

/** Round-trip properties for every codec kernel — the analog of the
  * reference's per-primitive encode→decode→assert harness
  * (reference: avro/AvroConverterTest.java:437-440), with the deterministic
  * randomized layer the reference lacks (SURVEY.md §5).
  */
class CodecSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  private def assertRoundTrip(codec: Codec, values: Array[Array[Byte]]): Unit = {
    val (meta, payload) = codec.encode(values)
    val decoded = codec.decode(meta, payload, values.length)
    assert(decoded.length == values.length)
    var i = 0
    while (i < values.length) {
      assert(
        java.util.Arrays.equals(decoded(i), values(i)),
        s"${codec.getClass.getSimpleName} mismatch at $i: " +
          s"'${new String(values(i), UTF_8).take(80)}' vs '${new String(decoded(i), UTF_8).take(80)}'")
      i += 1
    }
  }

  private def randomAscii(rng: SplittableRandom, maxLen: Int): Array[Byte] = {
    val n = rng.nextInt(maxLen + 1)
    val b = new Array[Byte](n)
    var i = 0
    while (i < n) { b(i) = (32 + rng.nextInt(95)).toByte; i += 1 }
    b
  }

  private def randomBinary(rng: SplittableRandom, maxLen: Int): Array[Byte] = {
    val n = rng.nextInt(maxLen + 1)
    val b = new Array[Byte](n)
    rng.nextBytes(b)
    b
  }

  private val edgeValues: Array[Array[Byte]] = Array(
    bytes(""),
    bytes("x"),
    bytes("多语言 🚀 café"),
    bytes("a" * 10000),
    Array[Byte](0, 1, 2, -1, -128, 127),
    bytes("line1\nline2\ttab\r\n"))

  // ---- plain ----
  test("plain round-trips edge values and random binary") {
    assertRoundTrip(PlainCodec, edgeValues)
    val rng = new SplittableRandom(1)
    for (trial <- 0 until 20) {
      val vals = Array.fill(1 + rng.nextInt(500))(randomBinary(rng, 200))
      assertRoundTrip(PlainCodec, vals)
    }
  }

  // ---- rle ----
  test("rle round-trips runs and degenerate no-run inputs") {
    val runs = Array.fill(100)(bytes("aaa")) ++ Array.fill(50)(bytes("bb")) ++
      Array(bytes("")) ++ Array.fill(3)(bytes("c"))
    assertRoundTrip(RleCodec, runs)
    val rng = new SplittableRandom(2)
    for (trial <- 0 until 20) {
      val pool = Array.fill(4)(randomBinary(rng, 30))
      val vals = Array.fill(1 + rng.nextInt(500))(pool(rng.nextInt(4)))
      assertRoundTrip(RleCodec, vals)
    }
    assertRoundTrip(RleCodec, edgeValues) // all distinct → runs of 1
  }

  test("rle compresses long runs") {
    val vals = Array.fill(10000)(bytes("same-value"))
    val (_, payload) = RleCodec.encode(vals)
    assert(payload.length < 50, s"rle payload ${payload.length}")
  }

  // ---- dict ----
  test("dict round-trips low-cardinality values") {
    val pool = Array("scala", "java", "python", "go", "rust").map(bytes)
    val rng = new SplittableRandom(3)
    val vals = Array.fill(5000)(pool(rng.nextInt(pool.length)))
    assertRoundTrip(DictCodec, vals)
    val (meta, payload) = DictCodec.encode(vals)
    assert(meta.length + payload.length < vals.map(_.length).sum / 4)
  }

  test("dict round-trips single distinct value and binary values") {
    assertRoundTrip(DictCodec, Array.fill(100)(bytes("only")))
    val rng = new SplittableRandom(4)
    val pool = Array.fill(300)(randomBinary(rng, 50))
    val vals = Array.fill(2000)(pool(rng.nextInt(pool.length)))
    assertRoundTrip(DictCodec, vals)
    assertRoundTrip(DictCodec, edgeValues)
  }

  // ---- for ----
  // ---- dict+rle hybrid ----
  test("dictrle round-trips runs, no-runs, single value, and binary") {
    val rng = new SplittableRandom(11)
    val vocab = Array("scala", "java", "rust", "go", "c++").map(bytes)
    val runs = Array.tabulate(4000)(i => vocab((i / 37) % vocab.length))
    assertRoundTrip(DictRleCodec, runs)
    val noRuns = Array.tabulate(500)(i => vocab(i % vocab.length))
    assertRoundTrip(DictRleCodec, noRuns)
    assertRoundTrip(DictRleCodec, Array.fill(100)(bytes("only")))
    assertRoundTrip(DictRleCodec, Array.tabulate(300)(_ => randomBinary(rng, 20)))
    assertRoundTrip(DictRleCodec, edgeValues)
  }

  test("dictrle beats rle and dict on low-ndv run-structured data") {
    val vocab = Array("python", "javascript", "typescript", "markdown").map(bytes)
    val values = Array.tabulate(8192)(i => vocab((i / 64) % vocab.length))
    def size(c: Codec): Long = {
      val (m, p) = c.encode(values)
      m.length.toLong + p.length
    }
    assert(size(DictRleCodec) < size(RleCodec))
    assert(size(DictRleCodec) < size(DictCodec))
  }

  test("canonicalLong accepts exactly Long.toString round-trips") {
    def ok(s: String) = ForLongCodec.canonicalLong(bytes(s))
    assert(ok("0").contains(0L))
    assert(ok("-1").contains(-1L))
    assert(ok("9223372036854775807").contains(Long.MaxValue))
    assert(ok("-9223372036854775808").contains(Long.MinValue))
    for (bad <- Seq("", "-", "-0", "00", "01", "+1", " 1", "1 ", "1.0", "1e3",
        "9223372036854775808", "-9223372036854775809", "abc", "0x10"))
      assert(ok(bad).isEmpty, s"should reject '$bad'")
  }

  test("for round-trips canonical longs incl. extremes") {
    // non-negative block reaching Long.MaxValue (range packable)
    val rng = new SplittableRandom(5)
    val hi = (Array(0L, 1L, Long.MaxValue, Long.MaxValue - 1) ++
      Array.fill(2000)(rng.nextLong() >>> 1)).map(l => bytes(l.toString))
    assert(ForLongCodec.accepts(hi))
    assertRoundTrip(ForLongCodec, hi)
    // mixed-sign narrow-range block
    val lo = (Array(-1000L, 1000L, 0L, -1L, 1L) ++
      Array.fill(2000)(rng.nextLong(-1000L, 1001L))).map(l => bytes(l.toString))
    assert(ForLongCodec.accepts(lo))
    assertRoundTrip(ForLongCodec, lo)
  }

  test("for rejects blocks with unpackable range and non-numeric values") {
    assert(!ForLongCodec.accepts(Array(bytes("9223372036854775807"), bytes("-9223372036854775808"))))
    assert(!ForLongCodec.accepts(Array(bytes("12"), bytes("nope"))))
    assert(!ForLongCodec.accepts(Array(bytes("012"))))
  }

  test("for compresses narrow ranges hard") {
    val vals = Array.tabulate(10000)(i => bytes((1000000 + i % 16).toString))
    val (meta, payload) = ForLongCodec.encode(vals)
    // 4 bits per value
    assert(meta.length + payload.length <= 10000 / 2 + 16)
    assertRoundTrip(ForLongCodec, vals)
  }

  // ---- hex ----
  test("hex round-trips lowercase hex and halves the size") {
    val rng = new SplittableRandom(6)
    val vals = Array.fill(500) {
      val b = new Array[Byte](20)
      rng.nextBytes(b)
      bytes(b.map(x => f"$x%02x").mkString)
    }
    assert(HexPackCodec.accepts(vals))
    assertRoundTrip(HexPackCodec, vals)
    val (meta, payload) = HexPackCodec.encode(vals)
    assert(meta.length + payload.length < vals.map(_.length).sum * 6 / 10)
  }

  test("hex rejects uppercase, odd length, non-hex") {
    assert(!HexPackCodec.accepts(Array(bytes("ABC0"))))
    assert(!HexPackCodec.accepts(Array(bytes("abc"))))
    assert(!HexPackCodec.accepts(Array(bytes("zz"))))
    assert(HexPackCodec.accepts(Array(bytes(""), bytes("00ff"))))
  }

  // ---- fsst ----
  test("fsst round-trips source-like text, edges, and random binary") {
    val rng = new SplittableRandom(7)
    val vocab = Array("def encode(buffer: Array[Byte])", "val result = ",
      "// TODO revisit", "import org.apache.spark", "return value\n")
    val vals = Array.fill(300) {
      val sb = new StringBuilder
      for (_ <- 0 until rng.nextInt(20)) sb.append(vocab(rng.nextInt(vocab.length)))
      bytes(sb.toString)
    } ++ edgeValues
    assertRoundTrip(Fsst, vals)
    for (trial <- 0 until 5) {
      val bin = Array.fill(50)(randomBinary(rng, 300))
      assertRoundTrip(Fsst, bin)
    }
  }

  test("fsst compresses repetitive source text") {
    val rng = new SplittableRandom(8)
    val vals = Array.fill(500)(bytes(
      s"val partition${rng.nextInt(100)} = encoder.encode(buffer, offset, length) // handler\n" * 4))
    val raw = vals.map(_.length).sum
    val (meta, payload) = Fsst.encode(vals)
    assert(meta.length + payload.length < raw / 2,
      s"fsst ratio: ${(meta.length + payload.length).toDouble / raw}")
    assertRoundTrip(Fsst, vals)
  }

  // ---- wrap ----
  test("zstd and deflate wraps round-trip") {
    val rng = new SplittableRandom(9)
    val data = new Array[Byte](100000)
    rng.nextBytes(data)
    for (w <- Seq(graft.model.WrapId.None, graft.model.WrapId.Zstd, graft.model.WrapId.Deflate)) {
      val c = Wrap.compress(w, data)
      assert(java.util.Arrays.equals(Wrap.decompress(w, c), data))
    }
    val text = bytes(("import org.apache.spark.sql.functions\n" * 3000))
    val z = Wrap.compress(graft.model.WrapId.Zstd, text)
    assert(z.length < text.length / 5)
  }

  test("codec registry resolves every id") {
    for (c <- Seq(PlainCodec, RleCodec, DictCodec, ForLongCodec, Fsst, HexPackCodec))
      assert(Codecs(c.id) eq c)
  }

  // ---- empty-block degenerate ----
  test("all codecs handle the empty block") {
    for (c <- Seq[Codec](PlainCodec, RleCodec, DictCodec, ForLongCodec, Fsst, HexPackCodec)) {
      assertRoundTrip(c, Array.empty[Array[Byte]])
    }
  }
}
