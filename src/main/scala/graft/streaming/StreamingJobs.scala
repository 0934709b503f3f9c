package graft.streaming

import graft.engine.{Checkpoint, Encoder}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface: the reference is batch-only (every task
  * runs one file to completion — SURVEY.md §1.1), so streaming here serves
  * the engine's ingestion story: continuously arriving source files are
  * encoded per micro-batch through the SAME resumable encoder, and the
  * events table gets the canonical watermark + tumbling-window aggregation.
  */
object StreamingJobs {

  /** windowed event aggregation over a file stream (same plan shape as the
    * batch q_events_hourly — watermark bounds state at scale)
    */
  def eventsHourlyStream(spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      // event-time watermarks need TIMESTAMP (the table stores NTZ; session
      // tz is pinned UTC so the instant is unchanged)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")) * 100).cast("long").as("value_c"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("value_c"))

  /** One deduplicated document per content hash, with a running duplicate
    * count — custom per-key state via flatMapGroupsWithState (the stateful
    * building block Spark's dropDuplicates cannot express: it keeps the
    * FIRST text AND counts how many dupes it absorbed). State is one small
    * record per distinct hash, bounded by processing-time timeout, so the
    * shape survives an unbounded stream: keys are hash-partitioned across
    * executors and each group's state is O(1).
    *
    * Input columns: (doc_id long, text string). Output one row per hash per
    * trigger where new duplicates arrived: (text_hash, first_doc_id, dupes).
    */
  final case class DedupState(firstDocId: Long, dupes: Long)

  /** @param stateTtl evict a hash's state after this processing-time idle
    *   period (Some, production — bounds total state on an unbounded
    *   stream); None disables eviction (deterministic tests / bounded
    *   input; also avoids the timeout-driven empty re-triggers)
    */
  def dedupStream(
      docs: Dataset[(Long, String)],
      stateTtl: Option[String] = Some("1 hour")): DataFrame = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      .map { case (id, text) =>
        (java.security.MessageDigest.getInstance("SHA-256")
          .digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString, id)
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[DedupState, (String, Long, Long)](
        OutputMode.Update(), timeoutConf) {
        (hash: String, rows: Iterator[(String, Long)], state: GroupState[DedupState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = rows.map(_._2).toVector
            val prev = state.getOption
            val first = prev.map(_.firstDocId).getOrElse(ids.min)
            val dupes = prev.map(_.dupes).getOrElse(-1L) + ids.size
            state.update(DedupState(first, dupes))
            stateTtl.foreach(state.setTimeoutDuration)
            Iterator.single((hash, first, dupes))
          }
      }
      .toDF("text_hash", "first_doc_id", "dupes")
  }

  /** continuous encode: each micro-batch of arriving source files runs
    * through the resumable block encoder (foreachBatch = the batch engine
    * unchanged; Spark's streaming checkpoint + our manifest give exactly-
    * once output per fingerprint)
    */
  def encodeStream(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      outDir: String,
      checkpointDir: String,
      cfg: Encoder.EncodeConfig = Encoder.EncodeConfig(numPartitions = 8)): StreamingQuery = {
    val cols = Seq("repo", "path", "commit", "lang", "content")
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // the fingerprint must identify the INPUT, not just the batch
          // number (Checkpoint's contract): a reset streaming checkpoint
          // re-assigns batchId 0 to a different file set, and a bare
          // "stream-batch-0" would match the old manifest and silently
          // skip encoding the new data. A replay of the SAME batch keeps
          // the same file set, so exactly-once resume still engages.
          val files = batch.inputFiles.sorted.mkString(",")
          val md = java.security.MessageDigest.getInstance("SHA-256")
          val fileFp = md.digest(files.getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          Checkpoint.encodeResumable(
            batch, cols, Seq("repo", "path", "commit"), cfg,
            s"$outDir/batch=$batchId",
            inputFingerprint = s"stream-batch-$batchId-$fileFp")
          ()
        }
      }
      .start()
  }
}
