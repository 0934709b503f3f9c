package graft.streaming

import graft.engine.{Checkpoint, Decoder}
import graft.gen.DataGen
import graft.model.EncodedBlock
import graft.verify.Sha256Check
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming hourly aggregation equals the batch plan") {
    spark.sparkContext.setLogLevel("WARN")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ev").toString
    events.write.mode("overwrite").parquet(s"$dir/in")

    val stream = StreamingJobs.eventsHourlyStream(spark, s"$dir/in", events.schema)
    val q = stream.writeStream
      .format("memory").queryName("hourly_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // append mode only emits windows the watermark has closed; every emitted
    // row must match the batch computation exactly
    val got = spark.table("hourly_out")
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")) * 100).cast("long").as("value_c"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("value_c"))
    assert(got.count() > 0)
    assert(got.join(batch, Seq("hour_start", "event_type", "n", "value_c"), "left_anti").count() == 0)
  }

  test("streaming encode ingests arriving files through the resumable encoder") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-enc").toString
    val df = DataGen.table(spark, DataGen.GenConfig(rows = 2000, parts = 4)).toDF()
    df.write.mode("overwrite").parquet(s"$dir/in")

    val q = StreamingJobs.encodeStream(spark, s"$dir/in", df.schema,
      s"$dir/out", s"$dir/ckpt")
    q.awaitTermination()

    val batchDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(batchDirs.nonEmpty)
    val cols = Seq("repo", "path", "commit", "lang", "content")
    val decoded = batchDirs.map { b =>
      Decoder.decode(
        spark.read.parquet(Checkpoint.blocksDir(b.getPath))
          .as(Encoders.product[EncodedBlock]), cols)
    }.reduce(_ unionByName _)
    assert(decoded.count() == 2000)
    assert(Sha256Check.mismatchGroups(df, decoded, cols) == 0)
  }

  test("stateful streaming dedup keeps first doc per hash and counts dupes") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = StreamingJobs.dedupStream(input.toDS(), stateTtl = None)
    val q = out.writeStream
      .format("memory").queryName("dedup_out").outputMode("update")
      .start()

    input.addData((1L, "aaa"), (2L, "bbb"), (3L, "aaa"))
    q.processAllAvailable()
    input.addData((4L, "aaa"), (5L, "ccc"))
    q.processAllAvailable()
    q.stop()

    // last update per hash wins: aaa first=1 dupes=2, bbb first=2 dupes=0,
    // ccc first=5 dupes=0
    val last = spark.table("dedup_out")
      .groupBy("text_hash")
      .agg(min(col("first_doc_id")).as("first_doc_id"),
        max(col("dupes")).as("dupes"))
      .collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(last == Map(1L -> 2L, 2L -> 0L, 5L -> 0L))
  }
}
