package graft.plan

import graft.codec._
import graft.model.ColStats

/** Statistics → codec decision tree. This automates what the reference
  * exposes as static writer knobs (dictionary on/off, compression codec,
  * page sizes — reference: parquet/IonToParquet.java:115-143,183-192):
  * the choice is made per column per partition from measured statistics.
  *
  * Decision order:
  *   1. canonical-long values with a packable range → frame-of-reference
  *   2. long runs of equal values (range-partition + sort makes these) → RLE
  *   3. low exact cardinality where the dictionary pays for itself → dict
  *   4. uniform hex strings (commit SHAs) → nibble packing
  *   5. long high-entropy text → FSST (trained per block)
  *   6. fallback → plain
  * A general-compressor wrap (zstd) is layered adaptively afterwards by the
  * block encoder (kept only when it actually shrinks the block).
  */
object CodecSelector {

  def select(s: ColStats): Codec = {
    val nonNull = s.count - s.nulls
    if (nonNull == 0) return PlainCodec

    if (s.allLongCanonical && rangePackable(s.minLong, s.maxLong)) return ForLongCodec

    val dictOk = s.ndvIsExact && s.ndv > 0 && s.ndv <= (1 << 16) && dictProfitable(s)

    // low-ndv + run structure → dict with RLE'd indices: each distinct
    // value stored once, each run ~2 bytes (plain RLE re-stores the value
    // bytes per run; plain dict pays the index width per row)
    if (dictOk && s.avgRun >= 2.0) return DictRleCodec

    if (s.avgRun >= 4.0) return RleCodec

    if (dictOk) return DictCodec

    if (s.allHex && s.minLen >= 8) return HexPackCodec

    if (s.avgLen >= 24.0) return Fsst

    PlainCodec
  }

  private def rangePackable(min: Long, max: Long): Boolean =
    try { Math.subtractExact(max, min); true } catch { case _: ArithmeticException => false }

  /** dict meta (≈ ndv * avgLen) + packed indices must clearly undercut the
    * plain encoding (totalBytes + one varint per value).
    */
  private def dictProfitable(s: ColStats): Boolean = {
    val nonNull = s.count - s.nulls
    if (s.ndv >= nonNull) return false
    val width = math.max(1, BitPack.width(s.ndv - 1))
    val dictBytes = s.ndv * (s.avgLen + 2.0)
    val packedBytes = nonNull * width / 8.0
    dictBytes + packedBytes < 0.8 * (s.totalBytes + nonNull)
  }
}
