package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], dim 64):
  * brute-force cosine top-k as the correctness baseline, and a seeded
  * random-hyperplane LSH-bucketed variant as the scale path (candidates
  * come from a bucket join, never a full cross product).
  */
object EmbedQueries {
  import Tables._

  val K = 5
  val NumQueries = 10
  val LshBits = 8

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x),
        lit(0.0), _ + _)).as("norm"))

  private def cosine(a: String, b: String): org.apache.spark.sql.Column =
    aggregate(zip_with(col(s"$a.embedding"), col(s"$b.embedding"),
      (x, y) => x.cast("double") * y), lit(0.0), _ + _) /
      (col(s"$a.norm") * col(s"$b.norm"))

  /** brute-force cosine top-k for the first NumQueries vectors (baseline):
    * small query side broadcast against the full corpus.
    */
  def bruteTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = withNorm(load(spark, sfDir, "embeddings"))
    val queries = vecs.where(col("vec_id") < NumQueries)
    val joined = vecs.as("c").join(
      broadcast(queries.as("q")), col("q.vec_id") =!= col("c.vec_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    joined
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine("q", "c").as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_r"))
      .orderBy("query_id", "rnk")
  }

  /** seeded deterministic hyperplane weight for (plane, dim) */
  private def planeWeight(p: Int, j: Int): Double = {
    var z = p.toLong * 131071L + j + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    // map to [-1, 1)
    (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  /** LSH signature + per-bucket candidate generation, then exact cosine
    * re-rank within buckets (the IVF/LSH-bucketed ANN scale path).
    */
  def lshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dim = 64
    val planes = Array.tabulate(LshBits, dim)((p, j) => planeWeight(p, j))
    val sigOf = (emb: Seq[Float]) => {
      var sig = 0
      var p = 0
      while (p < LshBits) {
        var dot = 0.0
        var j = 0
        while (j < dim && j < emb.length) { dot += planes(p)(j) * emb(j); j += 1 }
        if (dot >= 0) sig |= (1 << p)
        p += 1
      }
      sig
    }
    val base = load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) => (id, emb, sigOf(emb)) }
      .toDF("vec_id", "embedding", "sig")
    val vecs = base.select(col("vec_id"), col("embedding"), col("sig"),
      sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x),
        lit(0.0), _ + _)).as("norm"))
    val queries = vecs.where(col("vec_id") < NumQueries)
    // candidates share the signature bucket (multi-probe: exact bucket)
    val joined = vecs.as("c").join(broadcast(queries.as("q")),
      col("q.sig") === col("c.sig") && col("q.vec_id") =!= col("c.vec_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    joined
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine("q", "c").as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 6).as("cos_r"))
      .orderBy("query_id", "rnk")
  }

  /** LSH bucket histogram (bucket-size distribution — skew visibility) */
  def lshBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dim = 64
    val planes = Array.tabulate(LshBits, dim)((p, j) => planeWeight(p, j))
    load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (_, emb) =>
        var sig = 0
        var p = 0
        while (p < LshBits) {
          var dot = 0.0
          var j = 0
          while (j < dim && j < emb.length) { dot += planes(p)(j) * emb(j); j += 1 }
          if (dot >= 0) sig |= (1 << p)
          p += 1
        }
        sig
      }
      .toDF("sig")
      .groupBy("sig").count()
      .groupBy(col("count").as("bucket_size"))
      .agg(count(lit(1)).as("n_buckets"))
      .orderBy("bucket_size")
  }
}
