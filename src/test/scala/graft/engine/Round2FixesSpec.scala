package graft.engine

import graft.codec.{ForLongCodec, Wrap}
import graft.model.WrapId
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-2 regression coverage: FoR mayContain saturation, deflate
  * truncation surfacing, skew-plan driver bounds + salt edge cases, and
  * the degenerate-corpus guard on the n-gram Jaccard shingle join.
  */
class Round2FixesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-round2-fixes-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("mayContain: near-full-range FoR block must not overflow the bound") {
    // {1, Long.MaxValue} gives width 63; min + (2^63 - 1) would wrap
    val vals = Array("1", "9223372036854775807").map(_.getBytes("UTF-8"))
    val b = BlockCodec.encodeBlock("v", 0, 0, vals, ForLongCodec)
    assert(b.codecId == graft.model.CodecId.ForLong)
    assert(BlockCodec.mayContain(b, "9223372036854775807".getBytes("UTF-8")),
      "max value itself must be contained")
    assert(BlockCodec.mayContain(b, "1".getBytes("UTF-8")))
    assert(BlockCodec.mayContain(b, "12345".getBytes("UTF-8")), "in-range")
    assert(!BlockCodec.mayContain(b, "0".getBytes("UTF-8")), "below min")
  }

  test("truncated deflate stream throws instead of spinning") {
    val data = Array.fill[Byte](4096)(7)
    val z = Wrap.compress(WrapId.Deflate, data)
    val truncated = z.take(z.length / 2)
    val e = intercept[Exception](Wrap.decompress(WrapId.Deflate, truncated))
    assert(e.getMessage != null)
  }

  test("skewPlan returns only heavy hitters and tolerates null keys") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // 5000 rows of one heavy key + 2000 distinct singleton keys + nulls
    val rows = (0 until 5000).map(i => ("big", s"p$i")) ++
      (0 until 2000).map(i => (s"k$i", s"p$i")) ++
      (0 until 50).map(i => (null.asInstanceOf[String], s"p$i"))
    val df = rows.toDF("repo", "path")
    val plan = Encoder.skewPlan(df, "repo",
      Encoder.EncodeConfig(numPartitions = 8))
    assert(plan.keySet == Set("big"), s"only the heavy key, got $plan")
    assert(plan("big") > 1)
  }

  test("partitionInput works with a single sort key and a skewed group") {
    import spark.implicits._
    val df = ((0 until 3000).map(i => ("big", s"content $i")) ++
      (0 until 100).map(i => (s"k$i", s"c$i"))).toDF("repo", "content")
    val cfg = Encoder.EncodeConfig(numPartitions = 4)
    // sortKeys = Seq("repo") → restKeys empty: salt must hash other columns
    val out = Encoder.partitionInput(df, Seq("repo", "content"), Seq("repo"), cfg)
    assert(out.count() == 3100)
    // the heavy group itself must split across partitions (salt ≠ constant)
    val parts = out.where(col("repo") === lit("big").cast("binary"))
      .select(spark_partition_id().as("p")).distinct().count()
    assert(parts > 1, "salting should spread the heavy key")
  }

  test("ngramJaccard survives a degenerate corpus (universal shingle)") {
    import spark.implicits._
    // 60 identical docs + 540 unique docs, ALL sharing one universal shingle
    val dupText = "alpha beta gamma delta epsilon zeta"
    val docs = ((0 until 60).map(i => (i.toLong, dupText)) ++
      (60 until 600).map { i =>
        val uniq = (0 until 8).map(j => s"tok${i}_$j").mkString(" ")
        (i.toLong, s"$uniq common shingle here")
      }).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft-degen").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val t0 = System.nanoTime()
    val out = graft.queries.DedupQueries.ngramJaccard(spark, dir).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    // with the doc-frequency cap, "common shingle here" (540 docs) is pruned:
    // the only surviving pairs are the 60 identical docs (jac_bp = 10000)
    assert(out.length == 50, s"top-50 of C(60,2) identical pairs, got ${out.length}")
    assert(out.forall(_.getAs[Long]("jac_bp") == 10000L),
      "universal-shingle-only pairs must be pruned")
    assert(sec < 120, f"degenerate corpus must stay bounded, took $sec%.1f s")
  }

  test("encodeResumable persists the skew plan and reuses it on resume") {
    import spark.implicits._
    val df = ((0 until 2000).map(i => ("big", s"p$i", s"content $i")) ++
      (0 until 500).map(i => (s"k${i % 40}", s"p$i", s"c$i")))
      .toDF("repo", "path", "content")
    val dir = java.nio.file.Files.createTempDirectory("graft-skewresume").toString
    val cfg = Encoder.EncodeConfig(numPartitions = 4, blockRows = 256)
    val r1 = Checkpoint.encodeResumable(df, Seq("repo", "path", "content"),
      Seq("repo", "path"), cfg, dir, "fp-test")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      Checkpoint.skewPlanFile(dir))), "skew plan must be persisted")
    val r2 = Checkpoint.encodeResumable(df, Seq("repo", "path", "content"),
      Seq("repo", "path"), cfg, dir, "fp-test")
    assert(r2.skippedParts == r1.completedParts,
      s"resume must skip all ${r1.completedParts} completed partitions, " +
        s"skipped ${r2.skippedParts}")
    assert(r1.rowCount == r2.rowCount && r1.encodedBytes == r2.encodedBytes)
  }
}
