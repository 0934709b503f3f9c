package graft.tools

import graft.engine.Encoder
import graft.gen.DataGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost breakdown of the encode pipeline: where do the
  * seconds between "pure-JVM codec speed" (~100 MB/s on content,
  * tools.Profile) and the measured local[1] encode throughput (~40 MB/s,
  * graft.Bench) actually go?
  *
  * Stages (each adds one pipeline piece; reps are INTERLEAVED across
  * stages so one steal window cannot skew a single stage's min):
  *   scan      parquet scan + count
  *   shuffle   scan + binary cast + repartition (NOTE: an agg drain lets
  *             Catalyst EliminateSorts drop sortWithinPartitions, so this
  *             stage measures the shuffle WITHOUT the sort)
  *   sortint   shuffle + sortWithinPartitions + InternalRow drain
  *             (queryExecution.toRdd — no external-Row conversion)
  *   sortext   same drain through the public Dataset[Row] mapPartitions
  *             (adds the RowEncoder deserializer layer the encoder pays)
  *   encode    the full encode (adds the codec work)
  *
  * Usage: sbt "runMain graft.tools.EncodeBreakdown [rows] [cores] [reps]"
  */
object EncodeBreakdown {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 200000L
    val cores = if (args.length > 1) args(1).toInt else 1
    val reps = if (args.length > 2) args(2).toInt else 3
    val nParts = 64
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-breakdown")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft-breakdown").toString
    val input = s"$tmp/input.parquet"
    DataGen.table(spark, DataGen.GenConfig(rows = rows, parts = nParts))
      .write.mode("overwrite").parquet(input)
    val cols = Seq("repo", "path", "commit", "lang", "content")
    val sortKeys = Seq("repo", "path", "commit")
    val cfg = Encoder.EncodeConfig(numPartitions = nParts, blockRows = 16384)
    val skew = Some(Encoder.skewPlan(spark.read.parquet(input), "repo", cfg))
    val rawBytes = spark.read.parquet(input)
      .select(cols.map(c => length(col(c)).cast("long")).reduce(_ + _).as("l"))
      .agg(sum(col("l"))).first().getLong(0)

    def partitioned() =
      Encoder.partitionInput(spark.read.parquet(input), cols, sortKeys, cfg, skew)

    val stages: Seq[(String, () => Unit)] = Seq(
      "scan" -> (() => { spark.read.parquet(input).count(); () }),
      "shuffle" -> (() => {
        partitioned().groupBy().count().first() // EliminateSorts drops the sort
        ()
      }),
      "sortint" -> (() => {
        // InternalRow drain: plan executes shuffle + sort, rows consumed
        // without the external-Row deserializer
        val n = partitioned().queryExecution.toRdd.mapPartitions { rows =>
          var bytes = 0L
          while (rows.hasNext) {
            val r = rows.next()
            var c = 0
            while (c < 5) { if (!r.isNullAt(c)) bytes += r.getBinary(c).length; c += 1 }
          }
          Iterator.single(bytes)
        }.reduce(_ + _)
        require(n > 0)
      }),
      "sortext" -> (() => {
        import spark.implicits._
        val n = partitioned().mapPartitions { rows =>
          var bytes = 0L
          while (rows.hasNext) {
            val r = rows.next()
            var c = 0
            while (c < 5) { if (!r.isNullAt(c)) bytes += r.getAs[Array[Byte]](c).length; c += 1 }
          }
          Iterator.single(bytes)
        }.reduce(_ + _)
        require(n > 0)
      }),
      "encode" -> (() => {
        Encoder.encode(spark.read.parquet(input), cols, sortKeys, cfg, skew)
          .agg(sum(col("encodedBytes"))).first()
        ()
      }))

    println(f"rows=$rows raw=${rawBytes / 1e6}%.1f MB cores=$cores parts=$nParts reps=$reps (interleaved)")
    stages.foreach(_._2()) // one untimed warmup sweep
    val times = collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to reps; (name, f) <- stages) {
      val t0 = System.nanoTime(); f(); val s = (System.nanoTime() - t0) / 1e9
      times(name) = s :: times.getOrElse(name, Nil)
    }
    val best = stages.map { case (n, _) => n -> times(n).min }.toMap
    stages.foreach { case (n, _) =>
      println(f"$n%-8s ${best(n)}%7.2f s  ${rawBytes / best(n) / 1e6}%8.1f MB/s  " +
        f"(reps ${times(n).reverse.map(s => f"$s%.2f").mkString(", ")})")
    }
    println(f"deltas: shuffle=${best("shuffle") - best("scan")}%.2f " +
      f"sort=${best("sortint") - best("shuffle")}%.2f " +
      f"rowconv=${best("sortext") - best("sortint")}%.2f " +
      f"codec=${best("encode") - best("sortext")}%.2f " +
      f"(scan=${best("scan")}%.2f of ${best("encode")}%.2f total)")

    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    } catch { case _: Throwable => }
    spark.stop()
  }
}
