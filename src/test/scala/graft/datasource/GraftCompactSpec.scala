package graft.datasource

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction must be invisible to every read path: same rows (bit-
  * identical), same count(*) metadata answer, same filtered lookups —
  * with one file per partition afterwards. Crash windows (journal left
  * behind) must make readers fail loudly, and recover() must roll the
  * partition forward or back.
  */
class GraftCompactSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-compact-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def langs = Seq("en", "fr", "de", "ja", "pt")

  private def slice(from: Int, until: Int) = {
    import spark.implicits._
    (from until until).map { i =>
      (i.toString, s"body of document $i " + ("x" * (i % 50)),
        langs(i % langs.length), s"src${i % 7}")
    }.toDF("doc_id_s", "text", "lang", "source")
  }

  /** overwrite + two appends → several files per partition dir */
  private def buildFragmentedStore(): String = {
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    slice(0, 1500).write.format("graft")
      .option("sortKeys", "lang,source,doc_id_s").option("numPartitions", "4")
      .mode("overwrite").save(dir)
    slice(1500, 2600).write.format("graft")
      .option("sortKeys", "lang,source,doc_id_s").option("numPartitions", "4")
      .mode("append").save(dir)
    slice(2600, 4000).write.format("graft")
      .option("sortKeys", "lang,source,doc_id_s").option("numPartitions", "4")
      .mode("append").save(dir)
    dir
  }

  private def filesPerPartition(store: String): Map[Int, Int] = {
    val dir = GraftDataSource.blocksDir(store)
    val fs = dir.getFileSystem(new Configuration())
    fs.listStatus(dir).filter(_.getPath.getName.startsWith("partId="))
      .map { st =>
        st.getPath.getName.stripPrefix("partId=").toInt ->
          fs.listStatus(st.getPath).count(_.getPath.getName.endsWith(".parquet"))
      }.toMap
  }

  test("compaction: one file per partition, every read path unchanged") {
    val store = buildFragmentedStore()
    val before = filesPerPartition(store)
    assert(before.values.exists(_ > 1), s"store not fragmented: $before")

    val all = spark.read.format("graft").load(store)
      .collect().map(_.toString).sorted
    val countBefore = spark.read.format("graft").load(store).count()
    val lookupBefore = spark.read.format("graft").load(store)
      .where(col("doc_id_s") === "1234").collect().map(_.toString).sorted

    val report = GraftCompact.compactStore(spark, store)
    val after = filesPerPartition(store)
    assert(after.values.forall(_ == 1), s"not compacted: $after")
    assert(report.map(_.filesBefore).sum == before.values.sum)
    assert(report.forall(r => r.filesAfter == 1))

    assert(spark.read.format("graft").load(store).count() == countBefore)
    assert(spark.read.format("graft").load(store)
      .collect().map(_.toString).sorted.toSeq == all.toSeq)
    assert(spark.read.format("graft").load(store)
      .where(col("doc_id_s") === "1234")
      .collect().map(_.toString).sorted.toSeq == lookupBefore.toSeq)
  }

  test("compaction is idempotent (second run is a no-op)") {
    val store = buildFragmentedStore()
    GraftCompact.compactStore(spark, store)
    val snapshot = filesPerPartition(store)
    val report2 = GraftCompact.compactStore(spark, store)
    assert(filesPerPartition(store) == snapshot)
    assert(report2.forall(r => r.filesBefore == r.filesAfter && r.blockGroups == 0))
  }

  test("a leftover journal makes the reader fail loudly; recover rolls back") {
    val store = buildFragmentedStore()
    val dir = GraftDataSource.blocksDir(store)
    val fs = dir.getFileSystem(new Configuration())
    val part0 = fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith("partId=")).head.getPath

    // simulate a crash BEFORE publish: journal names a file that was never
    // renamed into place, plus a dangling .inprogress
    val journal = new Path(part0, GraftCompact.JournalName)
    val out = fs.create(journal, true)
    out.write("""{"newFile":"part-compact-dead.parquet","oldFiles":[]}""".getBytes("UTF-8"))
    out.close()
    val partial = fs.create(new Path(part0, "part-compact-dead.inprogress"), true)
    partial.write(Array[Byte](1, 2, 3)); partial.close()

    val e = intercept[Exception] {
      spark.read.format("graft").load(store).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("incomplete compaction")), e.toString)

    GraftCompact.recover(spark, store)
    assert(!fs.exists(journal))
    assert(!fs.exists(new Path(part0, "part-compact-dead.inprogress")))
    // rollback leaves the original data intact and readable
    assert(spark.read.format("graft").load(store).count() == 4000)
  }

  test("crash AFTER publish: recover finishes the sweep, no double count") {
    val store = buildFragmentedStore()
    val countBefore = spark.read.format("graft").load(store).count()
    val dir = GraftDataSource.blocksDir(store)
    val fs = dir.getFileSystem(new Configuration())
    val part0 = fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith("partId=")).head.getPath

    // run a real compaction of just this partition, then re-create the
    // crash window: resurrect the journal as if old-file deletion had not
    // happened — except the old files ARE gone, so recover's deletes are
    // no-ops; the key property is the journal blocks reads until resolved
    val oldFiles = fs.listStatus(part0)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath.getName)
    GraftCompact.compactStore(spark, store)
    val newFile = fs.listStatus(part0)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath.getName).head
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("newFile", newFile)
    val arr = root.putArray("oldFiles")
    oldFiles.foreach(arr.add)
    val out = fs.create(new Path(part0, GraftCompact.JournalName), true)
    out.write(mapper.writeValueAsBytes(root)); out.close()

    intercept[Exception] { spark.read.format("graft").load(store).count() }
    GraftCompact.recover(spark, store)
    assert(spark.read.format("graft").load(store).count() == countBefore)
  }

  test("120 streaming epochs: compaction bounds the offset; stale checkpoint refuses") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-epochs").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, String)]
    val q = input.toDS().toDF("doc_id_s", "lang", "text")
      .writeStream.format("graft")
      .option("sortKeys", "lang,doc_id_s")
      .option("numPartitions", "2")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .start(s"$dir/store")
    val nEpochs = 120
    (0 until nEpochs).foreach { e =>
      input.addData((e.toString, if (e % 2 == 0) "en" else "fr", s"body $e"))
      q.processAllAvailable()
    }
    q.stop()

    // the streaming-source offset carries the explicit per-partition file
    // set: after 120 one-row epochs it is O(epochs) — this is exactly what
    // GraftCompact is for
    val schema = GraftDataSource.schemaFor(s"$dir/store")
    val mbs = new GraftMicroBatchStream(s"$dir/store", schema, Nil)
    val before = mbs.latestOffset().asInstanceOf[GraftStreamOffset]
    val filesBefore = before.files.valuesIterator.map(_.size).sum
    assert(filesBefore >= nEpochs,
      s"expected >= $nEpochs epoch files, got $filesBefore")

    GraftCompact.compactStore(spark, s"$dir/store")

    // bounded: one file per partition dir, offset JSON shrinks accordingly
    val after = mbs.latestOffset().asInstanceOf[GraftStreamOffset]
    val filesAfter = after.files.valuesIterator.map(_.size).sum
    assert(filesAfter == after.files.size,
      s"expected 1 file/partition, got ${after.files.view.mapValues(_.size).toMap}")
    assert(after.json().length < before.json().length / 10)

    // epoch markers are swept into the tombstone (listings shrink with the
    // data files — without this, blocks/ keeps one marker per epoch forever)
    val blocks = GraftDataSource.blocksDir(s"$dir/store")
    val fs = blocks.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(blocks).exists(
      _.getPath.getName.startsWith("_epoch-q")),
      "compaction must sweep the per-epoch markers")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      blocks, GraftCompact.EpochTombstone)))
    // the tombstone carries each query's high-water mark: a sink replay of
    // a merged epoch refuses through it even though the marker is gone
    val tagMaxes = {
      val in = fs.open(new org.apache.hadoop.fs.Path(blocks, GraftCompact.EpochTombstone))
      val root = try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      val it = root.fields()
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      while (it.hasNext) { val e = it.next(); m(e.getKey) = e.getValue.asLong() }
      m.toMap
    }
    assert(tagMaxes.size == 1 && tagMaxes.values.head == (nEpochs - 1).toLong,
      s"tombstone must record the swept high-water mark, got $tagMaxes")

    // a consumer resuming from a PRE-compaction committed offset must
    // refuse loudly (the compacted file would replay every merged row),
    // pointing at the fresh-checkpoint maintenance contract
    val e1 = intercept[IllegalStateException] {
      mbs.planInputPartitions(before, after)
    }
    assert(e1.getMessage.contains("fresh checkpoint"))

    // a FRESH consumer reads the compacted store completely and correctly
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val q2 = spark.readStream.format("graft").load(s"$dir/store")
      .writeStream.option("checkpointLocation", s"$dir/ckpt2")
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) => { b.collect().foreach(seen.add); () })
      .start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.size == nEpochs)
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.map(_.getString(0)).toSet ==
      (0 until nEpochs).map(_.toString).toSet)
  }
}
