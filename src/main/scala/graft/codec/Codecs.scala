package graft.codec

import graft.model.CodecId

/** A lightweight per-column codec kernel. Pure Scala on byte arrays, zero
  * Spark imports — the analog of the reference's cell-coercion algebra
  * being testable without the task harness (reference:
  * avro/AvroConverterTest.java:437-440 encode→decode→assert round-trips).
  *
  * Contract: `decode(encode(values), values.length)` must reproduce every
  * value bit-identical. `values` never contains nulls (null handling lives
  * a layer up, in the block container).
  */
trait Codec extends Serializable {
  def id: Byte

  /** @return (meta, payload) */
  def encode(values: Array[Array[Byte]]): (Array[Byte], Array[Byte])

  def decode(meta: Array[Byte], payload: Array[Byte], count: Int): Array[Array[Byte]]

  /** Cheap full-block applicability check the encoder runs before trusting a
    * sampled-stats decision (sampling can miss a non-conforming value).
    */
  def accepts(values: Array[Array[Byte]]): Boolean = true
}

/** Concatenated values, each prefixed with its varint length. */
object PlainCodec extends Codec {
  val id: Byte = CodecId.Plain

  def encode(values: Array[Array[Byte]]): (Array[Byte], Array[Byte]) = {
    var total = 0L
    var i = 0
    while (i < values.length) { total += values(i).length + 5; i += 1 }
    val w = new ByteWriter(math.min(total, Int.MaxValue / 2).toInt)
    i = 0
    while (i < values.length) {
      w.writeVarInt(values(i).length)
      w.writeBytes(values(i))
      i += 1
    }
    (Array.emptyByteArray, w.result())
  }

  def decode(meta: Array[Byte], payload: Array[Byte], count: Int): Array[Array[Byte]] = {
    val r = new ByteReader(payload)
    val out = new Array[Array[Byte]](count)
    var i = 0
    while (i < count) {
      out(i) = r.readBytes(r.readVarInt())
      i += 1
    }
    out
  }
}

/** Run-length encoding: (varint runLen, varint valueLen, bytes)*. */
object RleCodec extends Codec {
  val id: Byte = CodecId.Rle

  def encode(values: Array[Array[Byte]]): (Array[Byte], Array[Byte]) = {
    val w = new ByteWriter(1024)
    var i = 0
    while (i < values.length) {
      val v = values(i)
      var j = i + 1
      while (j < values.length && java.util.Arrays.equals(values(j), v)) j += 1
      w.writeVarInt(j - i)
      w.writeVarInt(v.length)
      w.writeBytes(v)
      i = j
    }
    (Array.emptyByteArray, w.result())
  }

  def decode(meta: Array[Byte], payload: Array[Byte], count: Int): Array[Array[Byte]] = {
    val r = new ByteReader(payload)
    val out = new Array[Array[Byte]](count)
    var i = 0
    while (i < count) {
      val run = r.readVarInt()
      val v = r.readBytes(r.readVarInt())
      var k = 0
      while (k < run) { out(i + k) = v; k += 1 }
      i += run
    }
    out
  }
}

/** Dictionary encoding: meta = sorted dictionary (unsigned-lexicographic),
  * payload = fixed-width bit-packed indices. The selector gates this on
  * ndv, so dictionary size stays bounded (the reference's analog knob:
  * dictionary page size, parquet/IonToParquet.java:187-188).
  */
object DictCodec extends Codec {
  val id: Byte = CodecId.Dict

  private[codec] val unsignedLex: java.util.Comparator[Array[Byte]] =
    (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b)

  /** sorted-dict construction shared with DictRleCodec:
    * @return (meta bytes = varint n + entries, dict size, per-value index)
    */
  private[codec] def buildDict(values: Array[Array[Byte]]): (Array[Byte], Int, Array[Long]) = {
    // O(1) distinct via hashing, then one sort of the (small) dictionary
    val seen = new java.util.HashMap[ByteKey, ByteKey]()
    val keys = new Array[ByteKey](values.length) // per-value interned key
    var i = 0
    while (i < values.length) {
      val probe = new ByteKey(values(i))
      val existing = seen.putIfAbsent(probe, probe)
      keys(i) = if (existing == null) probe else existing
      i += 1
    }
    val dictKeys = seen.keySet().toArray(new Array[ByteKey](0))
    java.util.Arrays.sort(dictKeys, (a: ByteKey, b: ByteKey) => unsignedLex.compare(a.bytes, b.bytes))
    val dict = new Array[Array[Byte]](dictKeys.length)
    var d = 0
    while (d < dictKeys.length) { dictKeys(d).idx = d; dict(d) = dictKeys(d).bytes; d += 1 }

    val meta = new ByteWriter(1024)
    meta.writeVarInt(dict.length)
    var k = 0
    while (k < dict.length) {
      meta.writeVarInt(dict(k).length); meta.writeBytes(dict(k)); k += 1
    }

    val idx = new Array[Long](values.length)
    i = 0
    while (i < values.length) { idx(i) = keys(i).idx.toLong; i += 1 }
    (meta.result(), dict.length, idx)
  }

  private[codec] def readDict(meta: Array[Byte]): Array[Array[Byte]] = {
    val m = new ByteReader(meta)
    val dictSize = m.readVarInt()
    val dict = new Array[Array[Byte]](dictSize)
    var k = 0
    while (k < dictSize) { dict(k) = m.readBytes(m.readVarInt()); k += 1 }
    dict
  }

  def encode(values: Array[Array[Byte]]): (Array[Byte], Array[Byte]) = {
    val (meta, dictLen, idx) = buildDict(values)
    val w = BitPack.width(math.max(0, dictLen - 1).toLong)
    val payload = new ByteWriter(BitPack.packedBytes(values.length, w) + 1)
    payload.writeByte(w)
    payload.writeBytes(BitPack.pack(idx, w))
    (meta, payload.result())
  }

  def decode(meta: Array[Byte], payload: Array[Byte], count: Int): Array[Array[Byte]] = {
    val dict = readDict(meta)
    val r = new ByteReader(payload)
    val w = r.readByte()
    val idx = BitPack.unpack(r.readBytes(r.remaining), w, count)
    val out = new Array[Array[Byte]](count)
    var i = 0
    while (i < count) { out(i) = dict(idx(i).toInt); i += 1 }
    out
  }
}

/** Dict+RLE hybrid: the DICTIONARY layout of DictCodec (meta is byte-for-
  * byte the same, so block-skip `mayContain` probes work unchanged) with
  * the index stream run-length encoded — (varint runLen, varint idx)*.
  * Wins on low-ndv columns with run structure (sorted `lang`, `repo`):
  * each distinct value is stored once in the dict AND each run costs ~2
  * bytes, where plain RLE re-stores the value bytes per run and plain
  * dict pays the packed index width per ROW.
  */
object DictRleCodec extends Codec {
  val id: Byte = CodecId.DictRle

  def encode(values: Array[Array[Byte]]): (Array[Byte], Array[Byte]) = {
    val (meta, _, idx) = DictCodec.buildDict(values)
    val w = new ByteWriter(1024)
    var i = 0
    while (i < values.length) {
      val v = idx(i)
      var j = i + 1
      while (j < values.length && idx(j) == v) j += 1
      w.writeVarInt(j - i)
      w.writeVarLong(v)
      i = j
    }
    (meta, w.result())
  }

  def decode(meta: Array[Byte], payload: Array[Byte], count: Int): Array[Array[Byte]] = {
    val dict = DictCodec.readDict(meta)
    val r = new ByteReader(payload)
    val out = new Array[Array[Byte]](count)
    var i = 0
    while (i < count) {
      val run = r.readVarInt()
      val v = dict(r.readVarLong().toInt)
      var k = 0
      while (k < run) { out(i + k) = v; k += 1 }
      i += run
    }
    out
  }
}

/** Frame-of-reference over strings that are canonical base-10 longs
  * (i.e. `Long.toString` round-trips them exactly — leading zeros or "+"
  * disqualify a block, preserving bit-identity). meta = zigzag(min) +
  * width; payload = bit-packed (v - min).
  */
object ForLongCodec extends Codec {
  val id: Byte = CodecId.ForLong

  /** parse iff s == Long.toString(parsed) exactly (bit-identity gate) */
  def canonicalLong(b: Array[Byte]): Option[Long] = {
    val n = b.length
    if (n == 0 || n > 20) return None
    val neg = b(0) == '-'
    if (neg && n == 1) return None
    // no leading zero unless the value is exactly "0"; "-0"/"-01" are non-canonical
    val firstDigit = if (neg) 1 else 0
    if (b(firstDigit) == '0' && (neg || n > 1)) return None
    var v = 0L
    var i = firstDigit
    while (i < n) {
      val c = b(i)
      if (c < '0' || c > '9') return None
      val d = c - '0'
      if (v < (Long.MinValue + d) / 10) return None // would overflow (accumulate negative)
      v = v * 10 - d
      i += 1
    }
    if (!neg) {
      if (v == Long.MinValue) return None
      Some(-v)
    } else Some(v)
  }

  override def accepts(values: Array[Array[Byte]]): Boolean = {
    var i = 0
    var min = Long.MaxValue
    var max = Long.MinValue
    while (i < values.length) {
      canonicalLong(values(i)) match {
        case Some(v) =>
          if (v < min) min = v
          if (v > max) max = v
        case None => return false
      }
      i += 1
    }
    // range must fit in an unsigned-63-bit delta for bit-packing
    values.isEmpty || (try { Math.subtractExact(max, min) >= 0 } catch { case _: ArithmeticException => false })
  }

  def encode(values: Array[Array[Byte]]): (Array[Byte], Array[Byte]) = {
    val longs = new Array[Long](values.length)
    var min = Long.MaxValue
    var i = 0
    while (i < values.length) {
      longs(i) = canonicalLong(values(i)).getOrElse(
        throw new IllegalArgumentException(
          s"FoR codec on non-canonical-long value: ${new String(values(i), 0, math.min(values(i).length, 250), "UTF-8")}"))
      if (longs(i) < min) min = longs(i)
      i += 1
    }
    if (values.isEmpty) min = 0L
    var maxDelta = 0L
    i = 0
    while (i < values.length) { longs(i) -= min; if (longs(i) > maxDelta) maxDelta = longs(i); i += 1 }
    val w = BitPack.width(maxDelta)
    val meta = new ByteWriter(12)
    meta.writeZigZag(min)
    meta.writeByte(w)
    (meta.result(), BitPack.pack(longs, w))
  }

  def decode(meta: Array[Byte], payload: Array[Byte], count: Int): Array[Array[Byte]] = {
    val m = new ByteReader(meta)
    val min = m.readZigZag()
    val w = m.readByte()
    val deltas = BitPack.unpack(payload, w, count)
    val out = new Array[Array[Byte]](count)
    var i = 0
    while (i < count) {
      out(i) = java.lang.Long.toString(deltas(i) + min).getBytes("UTF-8")
      i += 1
    }
    out
  }
}

/** Nibble-packing for lowercase-hex strings of even length (e.g. 40-char
  * commit SHAs → 20 bytes). payload = (varint hexLen/2, packed bytes)*.
  */
object HexPackCodec extends Codec {
  val id: Byte = CodecId.HexPack

  private def hexVal(c: Byte): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  def isHex(b: Array[Byte]): Boolean = {
    if (b.length % 2 != 0) return false
    var i = 0
    while (i < b.length) { if (hexVal(b(i)) < 0) return false; i += 1 }
    true
  }

  override def accepts(values: Array[Array[Byte]]): Boolean = {
    var i = 0
    while (i < values.length) { if (!isHex(values(i))) return false; i += 1 }
    true
  }

  def encode(values: Array[Array[Byte]]): (Array[Byte], Array[Byte]) = {
    val w = new ByteWriter(1024)
    var i = 0
    while (i < values.length) {
      val v = values(i)
      w.writeVarInt(v.length / 2)
      var j = 0
      while (j < v.length) {
        w.writeByte((hexVal(v(j)) << 4) | hexVal(v(j + 1)))
        j += 2
      }
      i += 1
    }
    (Array.emptyByteArray, w.result())
  }

  private val hexChars = "0123456789abcdef".getBytes("UTF-8")

  def decode(meta: Array[Byte], payload: Array[Byte], count: Int): Array[Array[Byte]] = {
    val r = new ByteReader(payload)
    val out = new Array[Array[Byte]](count)
    var i = 0
    while (i < count) {
      val nBytes = r.readVarInt()
      val s = new Array[Byte](nBytes * 2)
      var j = 0
      while (j < nBytes) {
        val b = r.readByte()
        s(j * 2) = hexChars(b >>> 4)
        s(j * 2 + 1) = hexChars(b & 0xf)
        j += 1
      }
      out(i) = s
      i += 1
    }
    out
  }
}

object Codecs {
  val all: Map[Byte, Codec] =
    Seq(PlainCodec, RleCodec, DictCodec, ForLongCodec, Fsst, HexPackCodec, DictRleCodec)
      .map(c => c.id -> c).toMap

  def apply(id: Byte): Codec =
    all.getOrElse(id, throw new IllegalArgumentException(s"unknown codec id $id"))
}
