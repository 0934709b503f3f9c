package graft.stats

import graft.model.ColStats
import java.util.Arrays

/** Exact statistics over an in-memory column block (values may contain
  * nulls). This is the engine's "schema inference" analog: the reference
  * scans a bounded prefix of rows and merges per-field type evidence
  * (reference: avro/infer/InferAvroSchema.java:49-71); we scan the first
  * block of each partition and derive codec evidence — cardinality, run
  * structure, byte sizes, and numeric/hex value-range views.
  */
object BlockStats {

  private val NdvCap = 1 << 16

  def compute(colName: String, partId: Int, values: Array[Array[Byte]]): ColStats = {
    var nulls = 0L
    var totalBytes = 0L
    var minLen = Int.MaxValue
    var maxLen = 0
    var maxRun = 0
    var nRuns = 0L
    var curRun = 0
    var prev: Array[Byte] = null
    var allLong = true
    var minLong = Long.MaxValue
    var maxLong = Long.MinValue
    var allHex = true
    var hexLen = -2 // -2 = unset, -1 = non-uniform
    val seen = new java.util.HashSet[graft.codec.ByteKey]()
    var ndvExact = true

    var i = 0
    while (i < values.length) {
      val v = values(i)
      if (v == null) {
        nulls += 1
        if (curRun > 0) { if (curRun > maxRun) maxRun = curRun; curRun = 0 }
        prev = null
      } else {
        totalBytes += v.length
        if (v.length < minLen) minLen = v.length
        if (v.length > maxLen) maxLen = v.length
        if (prev != null && Arrays.equals(prev, v)) curRun += 1
        else {
          if (curRun > maxRun) maxRun = curRun
          curRun = 1
          nRuns += 1
        }
        prev = v
        // only a NEW distinct value beyond the cap makes ndv inexact — a
        // duplicate arriving while the set sits exactly at the cap must not
        // (a column of exactly NdvCap distinct values is exactly countable,
        // and the selector's dict bound `ndv <= 1<<16` is meant to admit it)
        if (ndvExact && seen.add(new graft.codec.ByteKey(v)) &&
            seen.size > NdvCap) ndvExact = false
        if (allLong) {
          graft.codec.ForLongCodec.canonicalLong(v) match {
            case Some(l) =>
              if (l < minLong) minLong = l
              if (l > maxLong) maxLong = l
            case None => allLong = false
          }
        }
        if (allHex) {
          if (!graft.codec.HexPackCodec.isHex(v)) allHex = false
          else if (hexLen == -2) hexLen = v.length
          else if (hexLen != v.length) hexLen = -1
        }
      }
      i += 1
    }
    if (curRun > maxRun) maxRun = curRun
    val nonNull = values.length - nulls
    ColStats(
      colName = colName,
      partId = partId,
      count = values.length.toLong,
      nulls = nulls,
      ndv = if (ndvExact) seen.size.toLong else NdvCap.toLong,
      ndvIsExact = ndvExact,
      totalBytes = totalBytes,
      minLen = if (nonNull == 0) 0 else minLen,
      maxLen = maxLen,
      maxRun = maxRun,
      nRuns = nRuns,
      allLongCanonical = allLong && nonNull > 0,
      minLong = if (allLong && nonNull > 0) minLong else 0L,
      maxLong = if (allLong && nonNull > 0) maxLong else 0L,
      allHex = allHex && nonNull > 0,
      hexLen = if (allHex && nonNull > 0) hexLen else -1)
  }
}
