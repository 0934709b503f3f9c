package graft.engine

import graft.codec._
import graft.model.{EncodedBlock, WrapId}

/** Block container (de)serialization + adaptive general-compressor wrap.
  *
  * Container layout (pre-wrap):
  *   [flags:1]                      bit0 = has nulls
  *   [null bitmap: ceil(n/8)]       present iff bit0 (bit set = null)
  *   [varint metaLen][meta][payload]
  *
  * `EncodedBlock.data` = [varint filterLen][filter?] ++ Wrap(wrapId, container).
  * The optional membership filter (graft.codec.BlockFilter, split-block
  * bloom) sits OUTSIDE the wrap so `mayContain` probes it without
  * decompressing anything; it is built only for codecs that lack exact
  * membership metadata (plain/RLE/FSST/hex — dict blocks binary-search
  * their dictionary and FoR blocks range-check instead) and only for
  * key-shaped values (bounded average length), so the 94%-of-bytes content
  * column pays nothing. The wrap is kept only when it actually shrinks the
  * block (measured, not guessed) — mirroring the reference layering GZIP
  * over dictionary-encoded Parquet pages
  * (reference: parquet/IonToParquet.java:186-188) but decided per block.
  */
object BlockCodec {

  val WrapAttemptMinBytes = 512
  val WrapKeepRatio = 0.98

  /** membership-filter gates: only blocks with at least this many non-null
    * values (pruning tiny blocks saves nothing) of key-like size (long text
    * is never point-looked-up by full value; hashing it would tax the
    * encode hot path for dead weight)
    */
  val FilterMinValues = 16
  val FilterMaxAvgLen = 256

  private def filterEligible(codecId: Byte): Boolean =
    codecId != graft.model.CodecId.Dict &&
      codecId != graft.model.CodecId.DictRle &&
      codecId != graft.model.CodecId.ForLong

  /** Encode one column block. `values` may contain nulls; `preferred` is the
    * partition-level selector choice, re-validated on the block (sampled
    * stats can miss a non-conforming value) with a plain fallback.
    */
  def encodeBlock(
      colName: String,
      partId: Int,
      blockIdx: Int,
      values: Array[Array[Byte]],
      preferred: Codec,
      // measured on FSST'd content: level 1 compresses the wrap 2.6x
      // faster but lands at 4.5x of raw vs level 3's 5.5x — level 3 keeps
      // the size bars' headroom; flip to 1 when ingest speed outranks size
      zstdLevel: Int = 3,
      /** pre-trained per-(partition,column) FSST table; null → train per block */
      fsstTable: Fsst.Table = null): EncodedBlock = {
    val n = values.length
    var nulls = 0
    var rawBytes = 0L
    var i = 0
    while (i < n) {
      if (values(i) == null) nulls += 1 else rawBytes += values(i).length
      i += 1
    }

    val nonNull: Array[Array[Byte]] =
      if (nulls == 0) values
      else {
        val out = new Array[Array[Byte]](n - nulls)
        var j = 0
        i = 0
        while (i < n) { if (values(i) != null) { out(j) = values(i); j += 1 }; i += 1 }
        out
      }

    val codec = if (preferred.accepts(nonNull)) preferred else PlainCodec
    val (meta, payload) =
      if (fsstTable != null && (codec eq Fsst)) Fsst.encodeWithTable(fsstTable, nonNull)
      else codec.encode(nonNull)

    val w = new ByteWriter(meta.length + payload.length + n / 8 + 16)
    w.writeByte(if (nulls > 0) 1 else 0)
    if (nulls > 0) {
      val bitmap = new Array[Byte]((n + 7) / 8)
      i = 0
      while (i < n) {
        if (values(i) == null) bitmap(i >> 3) = (bitmap(i >> 3) | (1 << (i & 7))).toByte
        i += 1
      }
      w.writeBytes(bitmap)
    }
    w.writeVarInt(meta.length)
    w.writeBytes(meta)
    w.writeBytes(payload)
    val container = w.result()

    var wrapId = WrapId.None
    var wrapped = container
    if (container.length >= WrapAttemptMinBytes) {
      val z = Wrap.compress(WrapId.Zstd, container, zstdLevel)
      if (z.length < container.length * WrapKeepRatio) { wrapId = WrapId.Zstd; wrapped = z }
    }

    // membership filter (split-block bloom) for codecs without exact
    // membership metadata — sized on the distinct-hash count so duplicate
    // values don't inflate it
    val filter: Array[Byte] =
      if (filterEligible(codec.id) && nonNull.length >= FilterMinValues &&
          rawBytes <= nonNull.length.toLong * FilterMaxAvgLen) {
        val hashes = new Array[Long](nonNull.length)
        i = 0
        while (i < nonNull.length) { hashes(i) = BlockFilter.hash64(nonNull(i)); i += 1 }
        val sorted = java.util.Arrays.copyOf(hashes, hashes.length)
        java.util.Arrays.sort(sorted)
        var distinct = 1
        i = 1
        while (i < sorted.length) {
          if (sorted(i) != sorted(i - 1)) distinct += 1
          i += 1
        }
        BlockFilter.build(hashes, distinct)
      } else null

    val fw = new ByteWriter(
      (if (filter == null) 0 else filter.length) + wrapped.length + 4)
    fw.writeVarInt(if (filter == null) 0 else filter.length)
    if (filter != null) fw.writeBytes(filter)
    fw.writeBytes(wrapped)
    val data = fw.result()

    // min/max value prefixes for block skipping (unsigned-lex on bytes ==
    // the UTF-8 code-point order Spark string comparisons use)
    var minV: Array[Byte] = null
    var maxV: Array[Byte] = null
    i = 0
    while (i < nonNull.length) {
      val v = nonNull(i)
      if (minV == null || java.util.Arrays.compareUnsigned(v, minV) < 0) minV = v
      if (maxV == null || java.util.Arrays.compareUnsigned(v, maxV) > 0) maxV = v
      i += 1
    }

    EncodedBlock(colName, partId, blockIdx, codec.id, wrapId, n, rawBytes,
      data.length.toLong, prefix24(minV), prefix24(maxV), data)
  }

  /** ≤24-char valid-UTF-8 prefix (truncated at a char boundary) */
  private def prefix24(b: Array[Byte]): String = {
    if (b == null) return null
    val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    if (s.length <= 24) s
    else {
      // don't split a surrogate pair
      val cut = if (Character.isHighSurrogate(s.charAt(23))) 23 else 24
      s.substring(0, cut)
    }
  }

  /** Cheap may-contain test WITHOUT decoding the payload: the membership
    * filter (when present) answers from its bitmap with zero decompression;
    * dict blocks binary-search the dictionary; FoR blocks range-check
    * against (min, width) from meta. Remaining codecs answer true (caller
    * decodes). This is the block-skipping analog of Parquet
    * dictionary/stats/bloom pruning.
    */
  def mayContain(b: EncodedBlock, value: Array[Byte]): Boolean =
    mayContainAny(b, Array(value))

  /** Batched may-contain: the filter header is parsed and (for dict/FoR)
    * the container decompressed ONCE for the whole probe set — an In-list
    * or runtime join-key set of thousands of values must not re-decompress
    * per value. True iff ANY value may be present.
    */
  def mayContainAny(b: EncodedBlock, values: Array[Array[Byte]]): Boolean = {
    val hdr = new ByteReader(b.data)
    val flen = hdr.readVarInt()
    if (flen < 0 || flen > hdr.remaining)
      throw new IllegalStateException(
        s"bad membership-filter header (len=$flen of ${b.data.length} bytes) — " +
          "block not written by this graft version?")
    val survivors: Array[Array[Byte]] =
      if (flen == 0) values
      else values.filter(BlockFilter.mayContain(b.data, hdr.position, flen, _))
    if (survivors.isEmpty) return false
    if (filterEligible(b.codecId)) return true // filter (or nothing) decided
    val container = Wrap.decompress(b.wrapId, b.data, hdr.position + flen)
    val r = new ByteReader(container)
    val flags = r.readByte()
    if ((flags & 1) != 0) r.skip((b.rowCount + 7) / 8)
    val meta = r.readBytes(r.readVarInt())
    b.codecId match {
      // DictRle shares the Dict meta layout byte-for-byte
      case graft.model.CodecId.Dict | graft.model.CodecId.DictRle =>
        // decode the sorted dictionary once, then binary-search each probe
        val m = new ByteReader(meta)
        val n = m.readVarInt()
        val dict = new Array[Array[Byte]](n)
        var i = 0
        while (i < n) { dict(i) = m.readBytes(m.readVarInt()); i += 1 }
        survivors.exists { v =>
          var lo = 0
          var hi = n - 1
          var found = false
          while (lo <= hi && !found) {
            val mid = (lo + hi) >>> 1
            val cmp = java.util.Arrays.compareUnsigned(dict(mid), v)
            if (cmp == 0) found = true
            else if (cmp < 0) lo = mid + 1
            else hi = mid - 1
          }
          found
        }
      case _ => // ForLong
        val m = new ByteReader(meta)
        val min = m.readZigZag()
        val w = m.readByte()
        // saturating upper bound: min + (2^w - 1) can wrap when min > 0
        // and w is large (e.g. block {1, Long.MaxValue} → w = 63)
        val span = if (w == 0) 0L else (1L << w) - 1L
        val max = if (w >= 64 || min > Long.MaxValue - span) Long.MaxValue
                  else min + span
        survivors.exists(v => graft.codec.ForLongCodec.canonicalLong(v) match {
          case None => false
          case Some(x) => x >= min && x <= max
        })
    }
  }

  /** Decode back to the original values (nulls reinserted, bit-identical). */
  def decodeBlock(b: EncodedBlock): Array[Array[Byte]] = {
    val hdr = new ByteReader(b.data)
    val flen = hdr.readVarInt()
    if (flen < 0 || flen > hdr.remaining)
      throw new IllegalStateException(
        s"bad membership-filter header (len=$flen of ${b.data.length} bytes) — " +
          "block not written by this graft version?")
    val container = Wrap.decompress(b.wrapId, b.data, hdr.position + flen)
    val r = new ByteReader(container)
    val flags = r.readByte()
    val hasNulls = (flags & 1) != 0
    val n = b.rowCount
    val bitmap = if (hasNulls) r.readBytes((n + 7) / 8) else null
    val meta = r.readBytes(r.readVarInt())
    val payload = r.readBytes(r.remaining)

    var nonNullCount = n
    if (hasNulls) {
      nonNullCount = 0
      var i = 0
      while (i < n) {
        if ((bitmap(i >> 3) & (1 << (i & 7))) == 0) nonNullCount += 1
        i += 1
      }
    }
    val decoded = Codecs(b.codecId).decode(meta, payload, nonNullCount)
    if (!hasNulls) decoded
    else {
      val out = new Array[Array[Byte]](n)
      var i = 0
      var j = 0
      while (i < n) {
        if ((bitmap(i >> 3) & (1 << (i & 7))) == 0) { out(i) = decoded(j); j += 1 }
        i += 1
      }
      out
    }
  }
}
