package graft.sources

/** Shared output-directory handling for the foreachPartition writers
  * (Avro container files, protobuf delimited streams, Excel workbooks —
  * formats Spark has no native writer for here).
  *
  * Two jobs:
  *   - `reset` gives them OVERWRITE semantics: without it, part files
  *     from a previous larger write survive a smaller rewrite and are
  *     read back as stale rows — every native Spark writer in this
  *     package already clears its target via mode("overwrite").
  *   - `create` opens part files through the Hadoop FileSystem API, so
  *     the writers land on cluster storage (HDFS/S3A/...), not silently
  *     on each executor's local disk the way java.io.File would.
  */
private[sources] object SinkDirs {

  /** driver-side: clear any previous output under `path` */
  def reset(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    ()
  }

  /** executor-side: create one part file (fresh Configuration — no active
    * session on executors, the established executor pattern)
    */
  def create(path: String, name: String): java.io.OutputStream = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    // a PRIVATE FileSystem instance: getFileSystem returns the JVM-cached
    // one, and flipping setWriteChecksum on it would disable .crc sidecars
    // for EVERY later local-FS write in this executor (graft block parquet,
    // manifests) — newInstance scopes the flip to this part file, and the
    // wrapper closes the instance with the stream
    val fs = org.apache.hadoop.fs.FileSystem.newInstance(
      p.toUri, new org.apache.hadoop.conf.Configuration())
    // no sidecar .crc files: these formats carry their own integrity
    // (avro sync markers, zip CRCs), and a local-FS checksum would turn
    // any out-of-band edit into a ChecksumException masking the format's
    // own typed error handling (no-op on HDFS, which checksums natively)
    // until the closing wrapper owns fs, a throw here (bad path,
    // permissions) must close the instance or it leaks in Hadoop's
    // unique-keyed FS cache — one instance per failed task attempt
    val raw =
      try {
        fs.setWriteChecksum(false)
        fs.create(p, true)
      } catch {
        case t: Throwable =>
          // close must not REPLACE the original create/permission error —
          // a throwing close is attached as suppressed instead
          try fs.close() catch { case c: Throwable => t.addSuppressed(c) }
          throw t
      }
    new java.io.FilterOutputStream(raw) {
      // FilterOutputStream writes arrays byte-at-a-time — delegate bulk
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        raw.write(b, off, len)
      override def close(): Unit =
        try super.close() finally fs.close()
    }
  }
}
