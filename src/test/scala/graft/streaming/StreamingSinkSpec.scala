package graft.streaming

import graft.datasource.{GraftCompact, GraftStreamingWrite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `df.writeStream.format("graft")` — the native streaming sink. Each
  * micro-batch must land exactly once (replayed epochs publish to
  * deterministic file names and discard duplicates), and the result must
  * read back bit-identically through the batch reader.
  */
class StreamingSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-sink-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("writeStream lands micro-batches exactly once, readable by the batch reader") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, String)]
    val dir = java.nio.file.Files.createTempDirectory("graft-ssink").toString

    val q = input.toDS().toDF("doc_id_s", "lang", "text")
      .writeStream.format("graft")
      .option("sortKeys", "lang,doc_id_s")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .start(s"$dir/store")

    input.addData((1 to 300).map(i => (i.toString, if (i % 2 == 0) "en" else "fr", s"text $i")): _*)
    q.processAllAvailable()
    input.addData((301 to 500).map(i => (i.toString, "de", s"text $i")): _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.format("graft").load(s"$dir/store")
    assert(got.count() == 500)
    assert(got.where(col("lang") === "de").count() == 200)
    assert(got.select("doc_id_s").as[String].collect().map(_.toInt).sorted.toSeq ==
      (1 to 500).toSeq)

    // epoch-tagged file names are the commit record
    val files = new java.io.File(s"$dir/store/blocks").listFiles()
      .filter(_.getName.startsWith("partId=")).flatMap(_.listFiles())
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.matches("part-q[0-9a-f]+-e\\d+-p\\d+\\.parquet")),
      files.mkString(","))

    // small epoch files compact away without changing any answer
    GraftCompact.compactStore(spark, s"$dir/store")
    val compacted = spark.read.format("graft").load(s"$dir/store")
    assert(compacted.count() == 500)
    assert(compacted.where(col("lang") === "de").count() == 200)
  }

  test("a replayed epoch cannot double-publish (deterministic names dedupe)") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-ssink-replay").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val write = new GraftStreamingWrite(dir, schema, "query-abc")
    val factory = write.createStreamingWriterFactory(null)

    def runAttempt(taskId: Long): org.apache.spark.sql.connector.write.WriterCommitMessage = {
      val w = factory.createWriter(0, taskId, 7L) // epochId = 7
      (1 to 50).foreach { i =>
        w.write(org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"k$i"),
          org.apache.spark.unsafe.types.UTF8String.fromString(s"v$i")))
      }
      w.commit()
    }

    write.commit(7L, Array(runAttempt(taskId = 0)))
    assert(spark.read.format("graft").load(dir).count() == 50)
    // replay: same epoch, new attempt (driver retried the batch)
    write.commit(7L, Array(runAttempt(taskId = 1)))
    assert(spark.read.format("graft").load(dir).count() == 50,
      "replayed epoch duplicated rows")
    val files = new java.io.File(s"$dir/blocks/partId=0").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.length == 1, files.mkString(","))
  }

  test("graft readStream to graft writeStream pipeline preserves every row") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ssink-pipe").toString
    val langs = Seq("en", "fr", "de")
    val df = (0 until 900).map(i =>
      (i.toString, s"doc body $i", langs(i % 3))).toDF("doc_id_s", "text", "lang")
    df.write.format("graft").option("sortKeys", "lang,doc_id_s")
      .option("numPartitions", "2").mode("overwrite").save(s"$dir/src")

    val q = spark.readStream.format("graft").load(s"$dir/src")
      .writeStream.format("graft")
      .option("sortKeys", "lang,doc_id_s")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$dir/dst")
    q.awaitTermination()

    val got = spark.read.format("graft").load(s"$dir/dst")
    assert(got.count() == 900)
    assert(graft.verify.Sha256Check.mismatchGroups(
      df, got, Seq("doc_id_s", "text", "lang")) == 0)
  }
}
