package graft.tools

import graft.queries.EmbedQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for q_neardup_clusters: pair construction vs the
  * propagation rounds (the round count is printed so per-round overhead is
  * readable directly).
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-cluster-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cp] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    // warm the session (JIT + codegen paths)
    spark.range(1000).selectExpr("sum(id)").collect()

    // pair-stage proxy: q_embed_neardup runs the same LSH candidate build
    // + the same full-pair cosine scoring, then only a cheap top-N
    val prox = t("pairs proxy (neardup)")(
      EmbedQueries.nearDupPairs(spark, sfDir).collect())
    println(s"[cp] pairs-proxy rows=${prox.length}")
    spark.catalog.clearCache()
    val full = t("full query")(EmbedQueries.nearDupClusters(spark, sfDir).collect())
    println(s"[cp] clusters=${full.length}")
    spark.catalog.clearCache()
    val full2 = t("full query (2nd)")(EmbedQueries.nearDupClusters(spark, sfDir).collect())
    println(s"[cp] clusters=${full2.length}")
    spark.stop()
  }
}
