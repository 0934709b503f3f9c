package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Sorted-order marker of a block store: `_sortkeys.json` inside the
  * blocks directory (underscore => invisible to spark.read's hidden-path
  * filter and to every partId= listing) records the column prefix by which
  * every partition's rows are KNOWN to be sorted, so the DSv2 scan can
  * report its output ordering and Spark can drop redundant sorts
  * (merge-join local sorts, window sorts over the store's own keys).
  *
  * Soundness rules — writers record only what the write actually
  * guarantees, and anything that could break the order clears the marker:
  *   - the one-shot DSv2 batch writer sorts by its sortKeys exactly
  *     -> full key list;
  *   - Checkpoint's encoder sorts by (head, salt, rest), so with a
  *     non-empty skew plan only the HEAD key order survives -> head only;
  *   - appends (batch append mode, streaming epochs) interleave sorted
  *     files -> clear;
  *   - compaction concatenates files -> cleared up front (before any
  *     partition is rewritten), so a mid-compaction crash can never leave
  *     a false ordering claim.
  * The scan additionally requires one file per partition at read time.
  */
object StoreMeta {

  val SortKeysFile = "_sortkeys.json"

  /** Block-store format version marker: `_format.json` in the blocks dir.
    *
    * v2 = the `[varint filterLen][membership filter][wrapped container]`
    * block layout. A v1 (pre-filter) block that was stored WrapId.None
    * starts with a flags byte (0/1) that PARSES as a valid filterLen, so
    * decodeBlock could silently misparse old stores into wrong values —
    * the marker turns that into a deterministic, loud refusal. Every
    * writer (Checkpoint, DSv2 batch/stream, compaction keeps it) stamps
    * the marker; readers refuse a store whose blocks exist without it or
    * with a different version.
    */
  val FormatFile = "_format.json"
  val FormatVersion = 2

  private def formatFileFor(blocksDir: Path) = new Path(blocksDir, FormatFile)

  /** stamp the store format (idempotent, temp-then-rename).
    *
    * `replaceDifferent = false` (the default) refuses to stamp OVER a
    * marker carrying another version: the loud-refusal design must not
    * depend on every future writer remembering to call checkFormat first
    * — only a caller that is about to DELETE the old blocks (overwrite
    * truncate) may pass true.
    */
  def writeFormatMarker(conf: Configuration, blocksDir: String,
      replaceDifferent: Boolean = false): Unit = {
    val dir = new Path(blocksDir)
    val f = formatFileFor(dir)
    val fs = f.getFileSystem(conf)
    readFormatVersion(conf, blocksDir) match {
      case Some(FormatVersion) => return
      case Some(other) if !replaceDifferent =>
        throw new IllegalStateException(
          s"$blocksDir carries format version $other — stamping version " +
            s"$FormatVersion over live blocks of another layout would let " +
            "them misparse silently; re-encode the store (or overwrite it)")
      case _ =>
    }
    fs.mkdirs(dir)
    val tmp = new Path(dir, FormatFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"formatVersion":$FormatVersion}""".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(f)) fs.delete(f, false)
    if (!fs.rename(tmp, f))
      throw new java.io.IOException(s"format marker rename failed in $blocksDir")
  }

  /** the recorded version, or None when the marker is absent/unreadable */
  def readFormatVersion(conf: Configuration, blocksDir: String): Option[Int] = {
    val f = formatFileFor(new Path(blocksDir))
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) return None
    try {
      val in = fs.open(f)
      val root = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      Option(root.get("formatVersion")).map(_.asInt())
    } catch { case _: Exception => None }
  }

  /** refuse to read a store whose block files predate the marker (or carry
    * a different version). An absent/empty blocks dir is fine — nothing to
    * misread yet.
    */
  def checkFormat(conf: Configuration, blocksDir: String): Unit = {
    val dir = new Path(blocksDir)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return
    readFormatVersion(conf, blocksDir) match {
      case Some(FormatVersion) => ()
      case Some(v) =>
        throw new IllegalStateException(
          s"graft store $blocksDir has format version $v; this build reads " +
            s"version $FormatVersion — re-encode the store with a matching build")
      case None =>
        val hasBlocks = fs.listStatus(dir).exists { st =>
          st.getPath.getName.startsWith("partId=") &&
            fs.listStatus(st.getPath).exists(_.getPath.getName.endsWith(".parquet"))
        }
        if (hasBlocks)
          throw new IllegalStateException(
            s"graft store $blocksDir has block files but no ${FormatFile} marker " +
              s"— written by a pre-v$FormatVersion build? Refusing to decode " +
              "(old WrapId.None blocks would misparse silently); re-encode the store")
    }
  }

  private def fileFor(blocksDir: Path) = new Path(blocksDir, SortKeysFile)

  /** record the sorted-by prefix (temp-then-rename, like every commit here) */
  def writeSortKeys(conf: Configuration, blocksDir: String, keys: Seq[String]): Unit = {
    val f = fileFor(new Path(blocksDir))
    val fs = f.getFileSystem(conf)
    val tmp = new Path(blocksDir, SortKeysFile + ".tmp")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val arr = root.putArray("sortKeys")
    keys.foreach(arr.add)
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
    if (fs.exists(f)) fs.delete(f, false)
    if (!fs.rename(tmp, f))
      throw new java.io.IOException(s"sortkeys marker rename failed in $blocksDir")
  }

  def clearSortKeys(conf: Configuration, blocksDir: String): Unit = {
    val fs = new Path(blocksDir).getFileSystem(conf)
    fs.delete(fileFor(new Path(blocksDir)), false)
    fs.delete(new Path(blocksDir, SortKeysFile + ".tmp"), false)
    ()
  }

  /** the recorded prefix, or empty when absent/unreadable (no claim) */
  def readSortKeys(conf: Configuration, blocksDir: String): Seq[String] = {
    val f = fileFor(new Path(blocksDir))
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) return Nil
    try {
      val in = fs.open(f)
      val root = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      val arr = root.get("sortKeys")
      (0 until arr.size()).map(arr.get(_).asText())
    } catch { case _: Exception => Nil }
  }
}
