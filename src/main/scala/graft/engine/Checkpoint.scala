package graft.engine

import graft.model.{EncodedBlock, ManifestEntry}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed per-partition lineage + codec/size metrics, giving encode
  * resumability: a partition whose manifest entry exists under the current
  * run fingerprint is skipped on re-run; stale partial output is cleaned.
  *
  * The manifest commit is atomic via temp-dir-then-rename — the same
  * pattern the reference uses for every task output (write temp file, then
  * putFile: reference csv/CsvToIon.java:175,269).
  */
object Checkpoint {

  def blocksDir(outDir: String) = s"$outDir/blocks"
  // no leading underscore: Spark's hidden-path filter skips `_*` when listing
  def manifestDir(outDir: String) = s"$outDir/manifest"

  final case class EncodeResult(
      completedParts: Int,
      skippedParts: Int,
      rowCount: Long,
      rawBytes: Long,
      encodedBytes: Long)

  def readManifest(spark: SparkSession, outDir: String): Dataset[ManifestEntry] = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(manifestDir(outDir)).as(Encoders.product[ManifestEntry])
  }

  private def manifestExists(spark: SparkSession, outDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(manifestDir(outDir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Encode `cols` of `df` to `outDir/blocks` (hive-partitioned by partId),
    * resuming past any partitions already committed in the manifest with a
    * matching fingerprint. `inputFingerprint` must identify input + plan
    * version, so a changed input or config invalidates prior work.
    */
  def encodeResumable(
      df: DataFrame,
      cols: Seq[String],
      sortKeys: Seq[String],
      cfg: Encoder.EncodeConfig,
      outDir: String,
      inputFingerprint: String): EncodeResult = {
    val spark = df.sparkSession
    val fp = fingerprint(inputFingerprint, cols, sortKeys, cfg)

    val completed: Set[Int] =
      if (!manifestExists(spark, outDir)) Set.empty
      else
        readManifest(spark, outDir)
          .filter(_.fingerprint == fp)
          .collect()
          .map(_.partId)
          .toSet

    // remove block output of partitions that never reached the manifest
    // (crashed mid-write) so re-encode does not duplicate
    cleanUncommitted(spark, outDir, completed)

    val partitioned = Encoder.partitionInput(df, cols, sortKeys, cfg)
    val blocks = Encoder.encodePartitioned(partitioned, cols, cfg, skipParts = completed)
    blocks.write
      .mode(SaveMode.Append)
      .partitionBy("partId")
      .parquet(blocksDir(outDir))

    // rebuild the manifest from the blocks actually on disk, then commit it
    val all = spark.read.parquet(blocksDir(outDir))
    val manifest = all
      .groupBy(col("partId"), col("colName"))
      .agg(
        concat_ws(",", sort_array(collect_set(col("codecId")))).as("codecIds"),
        count(lit(1)).as("nBlocks"),
        sum(col("rowCount")).as("rowCount"),
        sum(col("rawBytes")).as("rawBytes"),
        sum(col("encodedBytes")).as("encodedBytes"))
      .withColumn("fingerprint", lit(fp))
      .select("partId", "colName", "codecIds", "nBlocks", "rowCount", "rawBytes",
        "encodedBytes", "fingerprint")
    commitManifest(spark, manifest, outDir)

    val summary = manifest
      .agg(sum("rowCount"), sum("rawBytes"), sum("encodedBytes"),
        countDistinct("partId"))
      .first()
    EncodeResult(
      completedParts = summary.getLong(3).toInt,
      skippedParts = completed.size,
      rowCount = summary.getLong(0) / math.max(1, cols.length),
      rawBytes = summary.getLong(1),
      encodedBytes = summary.getLong(2))
  }

  private def cleanUncommitted(
      spark: SparkSession,
      outDir: String,
      completed: Set[Int]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bdir = new org.apache.hadoop.fs.Path(blocksDir(outDir))
    if (!fs.exists(bdir)) return
    fs.listStatus(bdir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("partId=")) {
        val pid = name.stripPrefix("partId=").toInt
        if (!completed.contains(pid)) fs.delete(st.getPath, true)
      }
    }
  }

  private def commitManifest(spark: SparkSession, manifest: DataFrame, outDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$outDir/manifest.tmp.d")
    val fin = new org.apache.hadoop.fs.Path(manifestDir(outDir))
    if (fs.exists(tmp)) fs.delete(tmp, true)
    manifest.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(fin)) fs.delete(fin, true)
    require(fs.rename(tmp, fin), s"atomic manifest rename failed: $tmp -> $fin")
  }

  def fingerprint(
      inputFingerprint: String,
      cols: Seq[String],
      sortKeys: Seq[String],
      cfg: Encoder.EncodeConfig): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val s = s"$inputFingerprint|${cols.mkString(",")}|${sortKeys.mkString(",")}|" +
      s"${cfg.numPartitions}|${cfg.blockRows}|${cfg.blockBytes}|${cfg.skewFactor}|${cfg.zstdLevel}|v1"
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }
}
