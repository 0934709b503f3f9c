package graft.tools

import graft.engine.Encoder
import graft.gen.DataGen
import org.apache.spark.sql.SparkSession

/** Standalone decode-throughput measurement: exactly Bench's decode leg
  * (encode generator output, cache, min-of-4 timed full decodes) but in a
  * FRESH session with nothing run before it — isolating the decode number
  * from the query-suite session state that precedes it inside the full
  * Bench. Also runs the pure-JVM decode probe in the same session, so each
  * invocation yields one (raw GB/s, probe GB/s, normalized) triple; two
  * invocations in different steal windows should agree on `normalized`
  * even when the raw numbers swing.
  * Usage: sbt "runMain graft.tools.DecodeBench [rows] [cores]"
  */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 800000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-decode-bench")
      .config("spark.sql.shuffle.partitions", math.max(32, cores).toString)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cols = Seq("repo", "path", "commit", "lang", "content")
    val df = DataGen.table(spark, DataGen.GenConfig(rows = rows, parts = 64)).toDF()
    val cfg = Encoder.EncodeConfig(numPartitions = 64, blockRows = 16384)
    val skew = Some(Encoder.skewPlan(df, "repo", cfg))
    val cached = Encoder.encode(df, cols, Seq("repo", "path", "commit"),
      cfg, skew).cache()
    cached.count()
    import org.apache.spark.sql.functions.{col, sum}
    val rawBytes = df.select(
      cols.map(c => org.apache.spark.sql.functions.length(col(c)).cast("long"))
        .reduce(_ + _).as("b")).agg(sum(col("b"))).first().getLong(0)
    graft.engine.Decoder.decode(cached, cols).count() // warm
    // probe rep adjacent to each decode rep; median paired ratio (same
    // discipline as Bench's decode leg — the window shifts mid-session)
    val probe = new graft.Bench.DecodeProbe(cores)
    val pairs = (1 to 4).map { _ =>
      val p = probe.gbpsOnce()
      val t0 = System.nanoTime()
      graft.engine.Decoder.decode(cached, cols).count()
      ((System.nanoTime() - t0) / 1e9, p)
    }
    val gbps = rawBytes / pairs.map(_._1).min / 1e9
    val norm = {
      val rs = pairs.map { case (d, p) => (rawBytes / d / 1e9) / p }.sorted
      (rs(1) + rs(2)) / 2
    }
    println(f"[decode-bench] rows=$rows raw=${rawBytes / 1e9}%.3f GB " +
      f"reps=${pairs.map(x => f"${x._1}%.2f").mkString(",")} s " +
      f"probes=${pairs.map(x => f"${x._2}%.2f").mkString(",")} GB/s " +
      f"decode=$gbps%.3f GB/s probe=${pairs.map(_._2).max}%.3f GB/s " +
      f"normalized=$norm%.3f")
    spark.stop()
  }
}
