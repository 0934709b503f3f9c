package graft.streaming

import graft.engine.{Checkpoint, Encoder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
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
          Checkpoint.encodeResumable(
            batch, cols, Seq("repo", "path", "commit"), cfg,
            s"$outDir/batch=$batchId", inputFingerprint = s"stream-batch-$batchId")
          ()
        }
      }
      .start()
  }
}
