package graft.codec

import graft.model.CodecId
import java.util.Arrays

/** FSST (Fast Static Symbol Table) string compression, implemented from the
  * published algorithm (Boncz, Neumann, Leis: "FSST: Fast Random Access
  * String Compression", VLDB 2020; see /root/repo/PAPERS.md corpus note):
  * a per-block table of at most 255 symbols, each 1–8 bytes, trained by a
  * fixed number of gain-driven generations over a bounded sample; encoding
  * is greedy longest-match with code 255 as a one-byte-literal escape.
  *
  * Deterministic by construction: the sample is stride-selected, the
  * generation count is fixed, and candidate selection breaks gain ties by
  * unsigned-lexicographic symbol order — the same block always trains the
  * same table (required for resumable re-runs to be byte-stable).
  *
  * Replaces the reference's static "dictionary encoding on/off" knob
  * (reference: parquet/IonToParquet.java:183-192) with a trained shared-
  * substring table for high-cardinality text like `content`.
  */
object Fsst extends Codec {
  val id: Byte = CodecId.Fsst

  private val EscapeCode = 255
  private val MaxSymbols = 255
  private val MaxSymLen = 8
  private val Generations = 5
  private val SampleBudget = 1 << 16 // 64 KiB of training text per block
  private val SampleValueCap = 2048 // bytes taken from any single sample value

  // ---- training ----------------------------------------------------------

  private val LE_LONG = java.lang.invoke.MethodHandles.byteArrayViewVarHandle(
    classOf[Array[Long]], java.nio.ByteOrder.LITTLE_ENDIAN)

  /** Symbol lookup tuned for the greedy matcher: per first byte, an
    * interleaved (mask, prefix, code) triplet array sorted longest-first; a
    * match test is one masked compare of the 8 cursor bytes (one VarHandle
    * read per position). 256 buckets keep the structure cache-resident.
    */
  final class Table(val symbols: Array[Array[Byte]]) {
    // per first byte: [mask, prefix, (code<<8 | len)]* sorted len desc
    private val buckets: Array[Array[Long]] = {
      val tmp = Array.fill(256)(List.empty[Int])
      var c = 0
      while (c < symbols.length) {
        val b0 = symbols(c)(0) & 0xff
        tmp(b0) = c :: tmp(b0)
        c += 1
      }
      tmp.map { cands =>
        val sorted = cands.sortBy(c => -symbols(c).length)
        val arr = new Array[Long](sorted.length * 3)
        var i = 0
        sorted.foreach { c =>
          val s = symbols(c)
          var packed = 0L
          var j = 0
          while (j < s.length) { packed |= (s(j).toLong & 0xffL) << (8 * j); j += 1 }
          arr(i) = if (s.length == 8) -1L else (1L << (8 * s.length)) - 1L
          arr(i + 1) = packed
          arr(i + 2) = (c.toLong << 8) | s.length.toLong
          i += 3
        }
        arr
      }
    }

    // ---- single-load dispatch for the encode hot loop (the shortCodes
    // idea from the published FSST encoder, Boncz et al. §4, re-derived
    // for a scan that stays EXACT longest-match). One 256 KiB int table
    // `combo`, indexed by the position's first TWO bytes, answers BOTH
    // tiers in one dependent load:
    //   high 16 bits  1 + start (long index) of the pair's len≥3 triplet
    //                 group in miniData (0 = no group); groups are
    //                 contiguous and self-terminating — each triplet's
    //                 third long carries its own pair in bits 40..55, so
    //                 the scan stops on the first triplet of another pair
    //                 with no separate count field or bitmap
    //   low 16 bits   the len ≤ 2 longest-match answer, packed
    //                 (code<<8 | len): the exact len-2 symbol for the pair
    //                 when one exists (at most ONE len-2 symbol can match
    //                 a pair — matching = byte equality), else b0's len-1
    //                 symbol, else 0xff01 = the ESCAPE baked in packed
    //                 form (code 255, advance 1) so the hot loop emits
    //                 every position through the same branch-free stores.
    //   avail=1       oneByte direct table (no second byte to index combo)
    //
    // The triplet array itself is ≤6 KiB (≤255 symbols × 3 longs) and
    // L1-resident; everything the matcher touches per position is combo
    // (one load) + that array.
    private val miniData: Array[Long] = {
      // group len≥3 symbols by (b0, b1): (pairIdx, bucketPos) keeps the
      // len-desc bucket order within each pair group
      val byPair = scala.collection.mutable.TreeMap.empty[Int, List[(Int, Int)]]
      var b0 = 0
      while (b0 < 256) {
        val list = buckets(b0)
        var i = 0
        while (i < list.length) {
          val len = (list(i + 2) & 0xffL).toInt
          if (len >= 3) {
            val b1 = ((list(i + 1) >>> 8) & 0xffL).toInt
            val idx = (b0 << 8) | b1
            byPair(idx) = byPair.getOrElse(idx, Nil) :+ ((b0, i))
          }
          i += 3
        }
        b0 += 1
      }
      val data = new Array[Long](byPair.valuesIterator.map(_.length).sum * 3)
      var off = 0
      byPair.foreach { case (idx, entries) =>
        entries.foreach { case (bb0, i) =>
          val list = buckets(bb0)
          data(off) = list(i)
          data(off + 1) = list(i + 1)
          // pair in bits 40..55 terminates the group scan; .toInt of the
          // long recovers the packed (code<<8 | len) untouched
          data(off + 2) = (idx.toLong << 40) | list(i + 2)
          off += 3
        }
      }
      data
    }

    /** packed (code<<8 | 1) of the single-byte symbol per first byte; -1 if none */
    private val oneByte: Array[Int] = {
      val t = Array.fill(256)(-1)
      var b0 = 0
      while (b0 < 256) {
        val list = buckets(b0)
        var i = 0
        while (i < list.length) {
          if ((list(i + 2) & 0xffL) == 1L && t(b0) == -1) t(b0) = list(i + 2).toInt
          i += 3
        }
        b0 += 1
      }
      t
    }

    /** the single-load dispatch table described above:
      * (groupStart+1) << 16 | len≤2 packed answer (0xff01 = escape)
      */
    private val combo: Array[Int] = {
      val t = new Array[Int](65536)
      // len ≤ 2 tier: b0's len-1 symbol under every second byte…
      var b0 = 0
      while (b0 < 256) {
        val v = if (oneByte(b0) >= 0) oneByte(b0) else 0xff01
        var b1 = 0
        while (b1 < 256) { t((b0 << 8) | b1) = v; b1 += 1 }
        b0 += 1
      }
      // …overridden by the exact len-2 symbol where one exists
      var c = 0
      while (c < symbols.length) {
        val s = symbols(c)
        if (s.length == 2)
          t(((s(0) & 0xff) << 8) | (s(1) & 0xff)) = (c << 8) | 2
        c += 1
      }
      // len ≥ 3 tier: group starts recovered from miniData itself (groups
      // are contiguous, pair-ordered) — first triplet of each pair wins,
      // stored as (longOffset+1) so 0 keeps meaning "no group"
      var k = 0
      while (k < miniData.length) {
        val pair = (miniData(k + 2) >>> 40).toInt
        if ((t(pair) >>> 16) == 0) t(pair) |= (k + 1) << 16
        k += 3
      }
      t
    }

    // exposed to the encode hot loop so it can keep them in locals
    private[Fsst] def dataArr: Array[Long] = miniData
    private[graft] def comboArr: Array[Int] = combo // graft: FsstProbe reads it

    /** longest symbol matching data[pos..end); returns (code<<8 | len)
      * packed so the hot loop never dereferences the symbols array; -1 if
      * none
      */
    def findLongestPacked(data: Array[Byte], pos: Int, end: Int): Int = {
      val avail = end - pos
      if (avail >= 2) {
        val pair = ((data(pos) & 0xff) << 8) | (data(pos + 1) & 0xff)
        val e = combo(pair)
        var i = e >>> 16
        if (i != 0) {
          i -= 1
          val dlen = miniData.length
          if (avail >= 8) {
            val w = LE_LONG.get(data, pos).asInstanceOf[Long]
            while (i < dlen && (miniData(i + 2) >>> 40).toInt == pair) {
              if ((w & miniData(i)) == miniData(i + 1)) return miniData(i + 2).toInt
              i += 3
            }
          } else {
            var w = 0L
            var j = 0
            while (j < avail) { w |= (data(pos + j).toLong & 0xffL) << (8 * j); j += 1 }
            while (i < dlen && (miniData(i + 2) >>> 40).toInt == pair) {
              if ((miniData(i + 2) & 0xffL) <= avail && (w & miniData(i)) == miniData(i + 1))
                return miniData(i + 2).toInt
              i += 3
            }
          }
        }
        val s = e & 0xffff
        if (s != 0xff01) s else -1
      } else oneByte(data(pos) & 0xff)
    }

    /** longest symbol code only (training path) */
    def findLongest(data: Array[Byte], pos: Int, end: Int): Int = {
      val p = findLongestPacked(data, pos, end)
      if (p < 0) -1 else p >>> 8
    }
  }

  /** Deterministic stride sample: up to SampleBudget bytes across the block. */
  private def sample(values: Array[Array[Byte]]): Array[Array[Byte]] = {
    if (values.isEmpty) return Array.empty
    val step = math.max(1, values.length / 64)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var budget = SampleBudget
    var i = 0
    while (i < values.length && budget > 0) {
      val v = values(i)
      if (v.length > 0) {
        val take = math.min(v.length, math.min(SampleValueCap, budget))
        out += (if (take == v.length) v else Arrays.copyOf(v, take))
        budget -= take
      }
      i += step
    }
    out.toArray
  }

  def train(values: Array[Array[Byte]]): Array[Array[Byte]] = {
    val samp = sample(values)
    var table = new Table(Array.empty)
    var gen = 0
    while (gen < Generations) {
      val cnt = new java.util.HashMap[ByteKey, Array[Long]]() // key → (count, len)
      def bump(b: Array[Byte]): Unit = {
        val k = new ByteKey(b)
        val cell = cnt.get(k)
        if (cell == null) cnt.put(k, Array(1L, b.length.toLong)) else cell(0) += 1
      }
      var vi = 0
      while (vi < samp.length) {
        val s = samp(vi)
        var pos = 0
        var prev: Array[Byte] = null
        while (pos < s.length) {
          val c = table.findLongest(s, pos, s.length)
          val sym = if (c >= 0) table.symbols(c) else Array(s(pos))
          bump(sym)
          if (prev != null && prev.length + sym.length <= MaxSymLen) {
            val pair = new Array[Byte](prev.length + sym.length)
            System.arraycopy(prev, 0, pair, 0, prev.length)
            System.arraycopy(sym, 0, pair, prev.length, sym.length)
            bump(pair)
          }
          prev = sym
          pos += sym.length
        }
        vi += 1
      }
      // pick top-255 by gain = count * len, ties broken lexicographically
      val entries = new java.util.ArrayList[(Array[Byte], Long)](cnt.size())
      cnt.forEach((k, cell) => { entries.add((k.bytes, cell(0) * cell(1))); () })
      entries.sort { (a: (Array[Byte], Long), b: (Array[Byte], Long)) =>
        if (a._2 != b._2) java.lang.Long.compare(b._2, a._2)
        else Arrays.compareUnsigned(a._1, b._1)
      }
      val n = math.min(MaxSymbols, entries.size())
      val syms = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) { syms(i) = entries.get(i)._1; i += 1 }
      table = new Table(syms)
      gen += 1
    }
    table.symbols
  }

  // ---- codec -------------------------------------------------------------

  def encode(values: Array[Array[Byte]]): (Array[Byte], Array[Byte]) =
    encodeWithTable(new Table(train(values)), values)

  /** Encode with a PRE-TRAINED table — the partition encoder trains once
    * per (partition, column) on the first block and reuses the table for
    * every later block of that column, removing training from the hot path.
    * Bit-identity is unaffected: the table is still stored in each block's
    * meta, so decode never depends on where the table came from.
    */
  def encodeWithTable(table: Table, values: Array[Array[Byte]]): (Array[Byte], Array[Byte]) = {
    val symbols = table.symbols

    val meta = new ByteWriter(1024)
    meta.writeByte(symbols.length)
    var c = 0
    while (c < symbols.length) {
      meta.writeByte(symbols(c).length)
      meta.writeBytes(symbols(c))
      c += 1
    }

    // hot loop: the match is inlined here with the table's flat arrays held
    // in locals — no field loads through `table` per position, and the
    // common case (avail ≥ 8, 0–2 candidates in the 2-byte bucket) runs
    // straight-line.
    // Measured dead ends (interleaved min-of-N A/B on this JVM, all
    // byte-identical output): one 8-byte window load per position instead
    // of two byte loads = 0.93x; LE-short pair load into a byte-swapped
    // dispatch table = 0.71x; short-store emit = 1.01x (noise); two-string
    // lockstep to hide the dependent-chain latency = 0.90x. The two plain
    // byte loads + byte stores below win — don't re-chase these.
    val combo = table.comboArr
    val miniData = table.dataArr
    val dlen = miniData.length
    val payload = new ByteWriter(4096)
    var scratch = new Array[Byte](1024) // raw reusable code buffer
    var i = 0
    while (i < values.length) {
      val v = values(i)
      val n = v.length
      if (scratch.length < 2 * n) scratch = new Array[Byte](2 * n)
      val buf = scratch
      var out = 0
      var pos = 0
      val nBulk = n - 8 // positions where a full 8-byte window exists
      while (pos <= nBulk) {
        val pair = ((v(pos) & 0xff) << 8) | (v(pos + 1) & 0xff)
        val e = combo(pair) // ONE dependent load answers both tiers
        var packed = e & 0xffff // len≤2 answer (or packed escape)
        var k = e >>> 16
        if (k != 0) { // pair has a len≥3 group: self-terminating scan
          k -= 1
          val w = LE_LONG.get(v, pos).asInstanceOf[Long]
          var found = 0 // (code<<8 | len) is never 0 (len >= 1)
          while (found == 0 && k < dlen && (miniData(k + 2) >>> 40).toInt == pair) {
            if ((w & miniData(k)) == miniData(k + 1)) found = miniData(k + 2).toInt
            k += 3
          }
          if (found != 0) packed = found
        }
        // branch-free emit: every position writes a (code, literal) pair;
        // the literal byte is only KEPT when code is the escape (out
        // advances 2), otherwise the next iteration overwrites it — the
        // escape-vs-symbol branch was the hot loop's least predictable
        val code = packed >>> 8
        buf(out) = code.toByte
        buf(out + 1) = v(pos)
        out += 1 + ((code + 1) >>> 8) // +1 iff code == 255 (escape)
        pos += packed & 0xff
      }
      while (pos < n) { // tail: windows shorter than 8 bytes
        val packed = table.findLongestPacked(v, pos, n)
        if (packed >= 0) {
          buf(out) = (packed >>> 8).toByte
          out += 1
          pos += packed & 0xff
        } else {
          buf(out) = EscapeCode.toByte
          buf(out + 1) = v(pos)
          out += 2
          pos += 1
        }
      }
      payload.writeVarInt(out)
      payload.writeBytes(buf, 0, out)
      i += 1
    }
    (meta.result(), payload.result())
  }

  def decode(meta: Array[Byte], payload: Array[Byte], count: Int): Array[Array[Byte]] = {
    val m = new ByteReader(meta)
    val n = m.readByte()
    // each symbol padded into one little-endian long + its length: emitting
    // a symbol is a single unconditional 8-byte store (into slack space)
    // plus a cursor advance by the true length — no per-symbol arraycopy
    val symWord = new Array[Long](n)
    val symLen = new Array[Int](n)
    var c = 0
    while (c < n) {
      val s = m.readBytes(m.readByte())
      var w = 0L
      var j = 0
      while (j < s.length) { w |= (s(j).toLong & 0xffL) << (8 * j); j += 1 }
      symWord(c) = w
      symLen(c) = s.length
      c += 1
    }

    val bytes = payload
    var rp = 0 // manual cursor: the loop is 2 loads + a store per code
    def readVarInt(): Int = {
      var v = 0; var shift = 0; var b = 0
      do {
        b = bytes(rp) & 0xff; rp += 1
        v |= (b & 0x7f) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    val out = new Array[Array[Byte]](count)
    var scratch = new Array[Byte](1032)
    var i = 0
    while (i < count) {
      val nCodes = readVarInt()
      // 8x slack sizing overflows Int for values over ~268M codes — blocks
      // are bounded at 32 MiB raw so this never fires on a graft store;
      // fail loudly rather than wrap negative and corrupt
      val need = nCodes.toLong * 8 + 8
      if (need > Int.MaxValue)
        throw new IllegalArgumentException(
          s"FSST value of $nCodes codes exceeds the decodable bound")
      if (scratch.length < need.toInt) scratch = new Array[Byte](need.toInt)
      val buf = scratch
      var pos = 0
      var j = 0
      while (j < nCodes) {
        val code = bytes(rp) & 0xff
        rp += 1
        j += 1
        if (code == EscapeCode) {
          buf(pos) = bytes(rp); rp += 1; pos += 1; j += 1
        } else {
          LE_LONG.set(buf, pos, symWord(code))
          pos += symLen(code)
        }
      }
      out(i) = Arrays.copyOf(buf, pos)
      i += 1
    }
    out
  }
}
