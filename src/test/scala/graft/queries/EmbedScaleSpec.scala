package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Scale evidence for the size-adaptive LSH: bits-per-band grow with the
  * corpus, so MEAN bucket population stays ~LshTargetBucket at any scale —
  * the property that keeps the candidate join bounded at 100× (a fixed
  * bucket count would hold corpus/2^bits rows per bucket and degenerate).
  */
class EmbedScaleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-embed-scale-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bits formula matches the SQL-integer semantics") {
    assert(EmbedQueries.lshBitsFor(1) == 4)
    assert(EmbedQueries.lshBitsFor(500) == 4)
    assert(EmbedQueries.lshBitsFor(512) == 4) // 512/32 = 16 = 2^4 exactly
    assert(EmbedQueries.lshBitsFor(513) == 5)
    assert(EmbedQueries.lshBitsFor(32 * 1024) == 10)
    assert(EmbedQueries.lshBitsFor(Long.MaxValue) == 24)
  }

  test("IVF cells formula: ~sqrt(n), integer-exact, clamped") {
    assert(EmbedQueries.ivfCellsFor(1) == 8)
    assert(EmbedQueries.ivfCellsFor(1000) == 32) // bitlen 10 -> 2^5
    assert(EmbedQueries.ivfCellsFor(1024) == 32) // bitlen 11 -> 2^5
    assert(EmbedQueries.ivfCellsFor(1 << 20) == 1024) // bitlen 21 -> 2^10
    assert(EmbedQueries.ivfCellsFor(Long.MaxValue) == 4096)
  }

  test("IVF finds the planted near-duplicate as the top neighbor") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 2000
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    // vectors 0..9 are queries; vector 1000+q is a slightly-perturbed copy
    // of query q — IVF must place copy and query in the same cell and
    // surface it as the #1 neighbor despite probing only IvfProbe cells
    spark.range(0, n, 1, 8).map { i =>
      val src: Long = if (i >= 1000 && i < 1010) i - 1000 else i.toLong
      val rng = new java.util.SplittableRandom(7L * src + 13)
      val base = Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat)
      val emb = if (src == i) base else {
        val jit = new java.util.SplittableRandom(99L * i)
        base.map(x => x + (jit.nextDouble() * 0.02 - 0.01).toFloat)
      }
      (i, emb, (i % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val top = EmbedQueries.ivfTopK(spark, dir)
      .where(org.apache.spark.sql.functions.col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0L until 10L).count(q => top.get(q).contains(q + 1000))
    assert(hits >= 8, s"planted near-dups found as top-1 for only $hits/10")
  }

  test("near-dup pairs surface the planted duplicates at the top ranks") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 2000
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    // same planted-copy construction as the IVF test: (q, 1000+q) are
    // true near-duplicates (cos ≈ 0.9999) in a sea of random vectors
    // (background candidate cosines ≈ 0.5 at best)
    spark.range(0, n, 1, 8).map { i =>
      val src: Long = if (i >= 1000 && i < 1010) i - 1000 else i.toLong
      val rng = new java.util.SplittableRandom(7L * src + 13)
      val base = Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat)
      val emb = if (src == i) base else {
        val jit = new java.util.SplittableRandom(99L * i)
        base.map(x => x + (jit.nextDouble() * 0.02 - 0.01).toFloat)
      }
      (i, emb, (i % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = EmbedQueries.nearDupPairs(spark, dir).collect()
    assert(rows.length == EmbedQueries.NearDupTopN)
    // every planted pair that shares ANY LSH bucket must outrank all
    // random pairs; a 1% perturbation flips each plane bit rarely, so
    // expect most of the 10 planted pairs in the top 10 rows
    val topTen = rows.take(10).map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 10L).count(q => topTen.contains((q, q + 1000)))
    assert(planted >= 8, s"only $planted/10 planted pairs in the top 10: $topTen")
    // ranks are dense 1..N and cosines non-increasing
    assert(rows.map(_.getLong(2)).toSeq == (1L to EmbedQueries.NearDupTopN).toSeq)
    val cs = rows.map(_.getLong(3)).toSeq
    assert(cs == cs.sorted.reverse, "cos_r6 must be non-increasing by rank")
  }

  test("near-dup clusters: planted duplicate CHAINS become one component") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 2000
    val dir = java.nio.file.Files.createTempDirectory("graft-clusters").toString
    // vectors 1000+q AND 1500+q are perturbed copies of query q (q < 10):
    // three mutually-near vectors per plant — label propagation must merge
    // the whole chain to min id q even when only (q,1000+q) and (q,1500+q)
    // share buckets (transitivity through q)
    spark.range(0, n, 1, 8).map { i =>
      val src: Long =
        if (i >= 1000 && i < 1010) i - 1000
        else if (i >= 1500 && i < 1510) i - 1500
        else i.toLong
      val rng = new java.util.SplittableRandom(7L * src + 13)
      val base = Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat)
      val emb = if (src == i) base else {
        val jit = new java.util.SplittableRandom(99L * i)
        base.map(x => x + (jit.nextDouble() * 0.02 - 0.01).toFloat)
      }
      (i, emb, (i % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = EmbedQueries.nearDupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // most planted triples must collapse into a component labeled q (the
    // min id) holding AT LEAST the three plants — random background pairs
    // above tau can legitimately chain extra members in, so sizes are a
    // lower bound, not an equality
    val full = (0L until 10L).count(q => rows.get(q).exists(_._1 >= 3))
    assert(full >= 8, s"only $full/10 planted triples clustered under q: $rows")
    // every cluster has >= 2 members and is labeled by its min member:
    // distinct members all >= cid with cid itself present, so the sum
    // strictly exceeds cid * size for any size >= 2
    assert(rows.forall { case (cid, (size, memberSum)) =>
      size >= 2 && memberSum > cid * size
    })
  }

  test("mean bucket size stays near the target as the corpus grows 16x") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (n <- Seq(1000, 16000)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-lsh-$n").toString
      spark.range(0, n, 1, 8).map { i =>
        val rng = new java.util.SplittableRandom(7L * i + 13)
        (i, Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat), (i % 10).toInt)
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

      val hist = EmbedQueries.lshBuckets(spark, dir).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val vecsPerBand = hist.map { case (_, sz, cnt) => sz * cnt }.sum /
        EmbedQueries.LshBands
      assert(vecsPerBand == n, s"every vector lands in every band at n=$n")
      val buckets = hist.map(_._3).sum / EmbedQueries.LshBands
      val mean = n.toDouble / buckets
      // target is 32; random data spreads unevenly (signs are correlated
      // across nearby planes), so allow a generous constant factor — the
      // POINT is that the mean does not grow ~16x with the corpus
      assert(mean < 16 * EmbedQueries.LshTargetBucket,
        s"n=$n mean bucket $mean must stay bounded")
      val maxBucket = hist.map(_._2).max
      assert(maxBucket <= n / 2, s"n=$n max bucket $maxBucket degenerated")
    }
  }
}
