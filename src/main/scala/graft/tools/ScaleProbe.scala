package graft.tools

import graft.engine.Encoder
import graft.gen.DataGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling diagnosis: time the encode phases separately at one parallelism
  * level. Usage: runMain graft.tools.ScaleProbe <cores> <rows> <nParts> [reps]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val rows = args(1).toLong
    val nParts = args(2).toInt
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("scale-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.shuffle.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "false"))
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val inputPath = s"$tmp/input.parquet"
    DataGen.table(spark, DataGen.GenConfig(rows = rows, parts = 64))
      .write.mode("overwrite").parquet(inputPath)

    val cols = Seq("repo", "path", "commit", "lang", "content")
    val cfg = Encoder.EncodeConfig(numPartitions = nParts, blockRows = 16384)

    def t(name: String)(f: => Unit): Unit = {
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        f
        println(f"[probe] cores=$cores $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    val df = spark.read.parquet(inputPath)
    if (sys.env.get("SPARK_GRAFT_PROBE_PHASES").contains("all")) {
      t("scan-only")(df.agg(sum(length(col("content")))).first())
      t("skew-plan")(Encoder.skewPlan(df, "repo", cfg))
      t("shuffle+sort")(
        Encoder.partitionInput(df, cols, Seq("repo", "path", "commit"), cfg)
          .mapPartitions(it => Iterator.single(it.map(_.getAs[Array[Byte]](4).length.toLong).sum))(
            org.apache.spark.sql.Encoders.scalaLong)
          .agg(sum(col("value"))).first())
    }
    t("full-encode")(
      Encoder.encode(df, cols, Seq("repo", "path", "commit"), cfg)
        .agg(sum(col("rawBytes")), sum(col("encodedBytes"))).first())
    spark.stop()
  }
}
