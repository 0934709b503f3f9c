package graft.model

/** Input-table row shape per BASELINE.json `input_hint`:
  * an Iceberg/Parquet table of source-code files, all-string columns.
  */
final case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Per-(partition, column) statistics produced by the sampling pass.
  *
  * Mirrors the reference's schema-inference scan
  * (reference: avro/infer/InferAvroSchema.java:49-71 — bounded scan +
  * associative merge), generalized from "which type is this column" to
  * "which codec should encode this column": cardinality, run structure,
  * byte sizes and value-range views drive the codec auto-selector.
  */
final case class ColStats(
    colName: String,
    partId: Int,
    count: Long,
    nulls: Long,
    ndv: Long,
    ndvIsExact: Boolean,
    totalBytes: Long,
    minLen: Int,
    maxLen: Int,
    /** longest run of equal adjacent values (in iteration order) */
    maxRun: Int,
    /** number of runs of equal adjacent values */
    nRuns: Long,
    /** every non-null value is a canonical base-10 Long (Long.toString round-trip) */
    allLongCanonical: Boolean,
    minLong: Long,
    maxLong: Long,
    /** every non-null value is lowercase hex of even length */
    allHex: Boolean,
    /** common hex length if uniform, else -1 */
    hexLen: Int) {

  def avgLen: Double = if (count - nulls <= 0) 0.0 else totalBytes.toDouble / (count - nulls)
  def avgRun: Double = if (nRuns <= 0) 1.0 else (count - nulls).toDouble / nRuns
  def ndvRatio: Double = if (count - nulls <= 0) 1.0 else ndv.toDouble / (count - nulls)
}

/** One encoded column block, reified as a row — the inverse of the
  * reference materializing rows out of Parquet pages
  * (reference: parquet/ParquetToIon.java:103-121).
  *
  * `data` is the self-describing block container (see graft.engine.BlockCodec):
  * wrap(flags ++ nullBitmap? ++ varint(metaLen) ++ meta ++ payload).
  */
final case class EncodedBlock(
    colName: String,
    partId: Int,
    blockIdx: Int,
    codecId: Byte,
    wrapId: Byte,
    rowCount: Int,
    rawBytes: Long,
    encodedBytes: Long,
    /** min/max value prefixes (≤24 chars) for block skipping — parquet
      * min/max stats on these columns let a filtered decode prune blocks
      * at the scan, before any decompression; null when the block is
      * all-null
      */
    minPrefix: String,
    maxPrefix: String,
    data: Array[Byte])

/** Per-(partition, column) lineage + metrics entry, checkpointed after each
  * encode run (the resumability analog of the reference's per-task
  * `records` counters, e.g. avro/IonToAvro.java:185).
  */
final case class ManifestEntry(
    partId: Int,
    colName: String,
    /** distinct codec ids used across this partition's blocks, sorted, comma-joined */
    codecIds: String,
    nBlocks: Long,
    rowCount: Long,
    rawBytes: Long,
    encodedBytes: Long,
    fingerprint: String)

/** Stable codec identifiers (persisted in EncodedBlock.codecId). */
object CodecId {
  val Plain: Byte = 0
  val Rle: Byte = 1
  val Dict: Byte = 2
  val ForLong: Byte = 3
  val Fsst: Byte = 4
  val HexPack: Byte = 5
  val DictRle: Byte = 6

  def name(id: Byte): String = id match {
    case Plain => "plain"
    case Rle => "rle"
    case Dict => "dict"
    case ForLong => "for"
    case Fsst => "fsst"
    case HexPack => "hex"
    case DictRle => "dictrle"
    case other => s"unknown($other)"
  }
}

/** Stable wrapper (general-compressor layer) identifiers. */
object WrapId {
  val None: Byte = 0
  val Zstd: Byte = 1
  val Deflate: Byte = 2
}
