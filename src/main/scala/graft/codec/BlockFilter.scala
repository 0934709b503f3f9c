package graft.codec

/** Split-block Bloom filter for per-block membership pruning.
  *
  * Fills the gap `BlockCodec.mayContain` leaves for codecs WITHOUT exact
  * membership metadata (plain / RLE / FSST / hex): dictionary blocks
  * binary-search their dictionary and FoR blocks range-check, but a point
  * lookup on a high-NDV plain/FSST/hex column (path-like keys, commit
  * hashes) previously had to decompress + decode every block the 24-char
  * min/max prefixes could not rule out. At 100 TB that is the difference
  * between touching a handful of blocks and decompressing a whole column.
  *
  * The scheme is the split-block Bloom filter of the Apache Parquet format
  * spec (publicly documented in parquet-format BloomFilter.md, after
  * Putze/Sanders/Singler, "Cache-, Hash- and Space-Efficient Bloom
  * Filters"): the filter is an array of 32-byte blocks; a key probes
  * exactly ONE block (one cache line) in which 8 bits — one per 32-bit
  * word, chosen by 8 odd salt multipliers — must all be set. ~1.25 bytes
  * per distinct value gives a measured false-positive rate around 1%.
  *
  * Everything here is deterministic (no seeds, no wall-clock), so encode
  * stays resume-stable: re-encoding the same block yields byte-identical
  * filters. NOT coupled to any DuckDB oracle — filters are a pure
  * may-contain optimization, verified by the "can only skip, never drop"
  * property (a false negative would lose rows; false positives only cost
  * a decode).
  */
object BlockFilter {

  /** bytes per filter block: 8 words x 32 bits = one cache line half */
  private val BlockBytes = 32

  /** the 8 odd salt constants of the parquet-format split-block scheme */
  private val Salt = Array(
    0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
    0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  /** ~10 bits per distinct value -> ~1% false positives */
  private val BytesPerDistinct = 1.25

  /** 64-bit hash of a value: FNV-1a over the bytes, then a splitmix64-style
    * avalanche so both halves (block selector / bit mask) are well mixed.
    */
  def hash64(v: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < v.length) {
      h ^= (v(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finalizer
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** top 32 bits pick the block via multiply-shift range reduction
    * (unbiased enough, no modulo, works for any block count)
    */
  private def blockIndex(h: Long, nBlocks: Int): Int =
    (((h >>> 32) * nBlocks) >>> 32).toInt

  /** Build a filter over the given 64-bit value hashes. `distinct` sizes the
    * filter (duplicate hashes only re-set the same bits).
    */
  def build(hashes: Array[Long], distinct: Int): Array[Byte] = {
    val nBlocks = math.max(1,
      math.ceil(distinct * BytesPerDistinct / BlockBytes).toInt)
    val words = new Array[Int](nBlocks * 8)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      val base = blockIndex(h, nBlocks) * 8
      val x = h.toInt
      var k = 0
      while (k < 8) {
        words(base + k) |= 1 << ((x * Salt(k)) >>> 27)
        k += 1
      }
      i += 1
    }
    val out = new Array[Byte](words.length * 4)
    i = 0
    while (i < words.length) {
      val w = words(i)
      out(i * 4) = w.toByte
      out(i * 4 + 1) = (w >>> 8).toByte
      out(i * 4 + 2) = (w >>> 16).toByte
      out(i * 4 + 3) = (w >>> 24).toByte
      i += 1
    }
    out
  }

  /** probe WITHOUT decompressing anything; false => value definitely absent */
  def mayContain(filter: Array[Byte], off: Int, len: Int, v: Array[Byte]): Boolean = {
    val nBlocks = len / BlockBytes
    if (nBlocks <= 0) return true // malformed/empty -> conservative
    val h = hash64(v)
    val base = off + blockIndex(h, nBlocks) * BlockBytes
    val x = h.toInt
    var k = 0
    while (k < 8) {
      val bit = (x * Salt(k)) >>> 27
      val b = filter(base + k * 4 + (bit >>> 3))
      if (((b >>> (bit & 7)) & 1) == 0) return false
      k += 1
    }
    true
  }

  def mayContain(filter: Array[Byte], v: Array[Byte]): Boolean =
    mayContain(filter, 0, filter.length, v)
}
