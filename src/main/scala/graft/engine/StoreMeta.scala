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
