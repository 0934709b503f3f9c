package graft.tools

import graft.engine.{BlockCodec, Encoder}
import graft.gen.DataGen
import org.apache.spark.sql.SparkSession

/** Measures what the per-block membership filters (graft.codec.BlockFilter)
  * buy a high-NDV point lookup: encode the generated table, take every
  * block of the unique `path` column, and probe (a) present keys — must all
  * pass (never-drop), and (b) absent keys — report how many blocks
  * mayContain rejects WITHOUT decompression. Before the filters, plain/FSST
  * blocks always answered "maybe", so an absent-key lookup decompressed
  * every block the 24-char min/max prefixes let through.
  *
  * Usage: sbt "runMain graft.tools.FilterProbe [rows]"
  */
object FilterProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 100000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-filter-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cols = Seq("repo", "path", "commit", "lang", "content")
    val df = DataGen.table(spark, DataGen.GenConfig(rows = rows)).toDF()
    val blocks = Encoder.encode(df, cols, Seq("repo", "path", "commit"),
      Encoder.EncodeConfig(numPartitions = 16, blockRows = 4096))

    val pathBlocks = blocks.filter(_.colName == "path").collect()
    val byCodec = pathBlocks.groupBy(b => graft.model.CodecId.name(b.codecId))
      .map { case (k, v) => s"$k=${v.length}" }.mkString(", ")
    println(s"[probe] path blocks: ${pathBlocks.length} ($byCodec)")

    import spark.implicits._
    val present = df.select("path").as[String].take(200)
    var falseNeg = 0
    present.foreach { p =>
      val v = p.getBytes("UTF-8")
      // at least the block(s) actually holding p must answer maybe
      if (!pathBlocks.exists(BlockCodec.mayContain(_, v))) falseNeg += 1
    }
    println(s"[probe] present keys rejected everywhere (MUST be 0): $falseNeg")

    var absentSurvivors = 0L
    val nAbsent = 500
    (0 until nAbsent).foreach { i =>
      val v = s"src/never/absent_$i.nope".getBytes("UTF-8")
      absentSurvivors += pathBlocks.count(BlockCodec.mayContain(_, v))
    }
    val avg = absentSurvivors.toDouble / nAbsent
    val pct = 100.0 * avg / math.max(1, pathBlocks.length)
    println(f"[probe] absent key touches $avg%.2f of ${pathBlocks.length} blocks ($pct%.2f%%) " +
      "— 100% before membership filters")
    if (falseNeg > 0) { println("[probe] FAIL"); sys.exit(1) }
    println("[probe] PASS")
    spark.stop()
  }
}
