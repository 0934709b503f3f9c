package graft

import graft.engine.{BlockCodec, Encoder}
import graft.gen.DataGen
import graft.plan.CodecSelector
import graft.stats.BlockStats
import graft.verify.SizeBar
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Headline: encode throughput (GB/s) of the engine over the synthetic
  * source-code table at multiple parallelism levels on the SAME input with
  * the SAME partition count — local[k] cores are the sandbox stand-in for
  * the north rule's N vs 4N executors (BASELINE.md). Levels are interleaved
  * across repetitions and the per-level MIN is reported, because this host's
  * effective CPU speed fluctuates ~2x between runs (hypervisor steal).
  * Also reports compressed size vs the Parquet-snappy and Avro-deflate bars
  * and per-query wall times for SparkEntry.queries on sfDir.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(32, cores).toString)
      // scan parallelism must exceed core count (default 128m bin-packs the
      // bench input into ~9 tasks, starving local[32])
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // AQE re-planning buys nothing for the explicitly-partitioned encode
      // and adds driver latency to every stage
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Pure-JVM decode probe (no Spark): encode 64 fixed blocks once, then
    * time decodeBlock over all of them on `threads` threads. This is a
    * host-speed yardstick taken ADJACENT to each Spark decode rep — the
    * ~8x cross-window spread in driver decode numbers is hypervisor
    * steal, and the per-rep (spark / probe) ratio cancels it, but only
    * when both sides of the ratio saw the SAME window: the window can
    * shift WITHIN a session (observed reps 2.0→6.0 s back-to-back), so a
    * single probe taken after all decode reps mis-normalizes. Construction
    * runs one untimed warmup rep (cold-JIT probes read 2-4x low).
    */
  private[graft] final class DecodeProbe(threads: Int) {
    private val rowsPerBlock = 8000
    private val nBlocks = 64
    private val cfg = DataGen.GenConfig(rows = rowsPerBlock.toLong * nBlocks)
    private val (encoded, rawBytes) = {
      val rows = (0L until cfg.rows).toArray.map(i => DataGen.row(i, cfg))
      val blocks: Array[Array[Array[Byte]]] = rows.grouped(rowsPerBlock)
        .map(_.map(_.content.getBytes("UTF-8"))).toArray
      val enc = blocks.zipWithIndex.map { case (b, i) =>
        val codec = CodecSelector.select(BlockStats.compute("content", 0, b))
        BlockCodec.encodeBlock("content", 0, i, b, codec)
      }
      (enc, blocks.map(_.map(_.length.toLong).sum).sum)
    }
    gbpsOnce() // untimed JIT warmup

    /** one timed probe rep: GB/s of the fixed block set right now */
    def gbpsOnce(): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val t0 = System.nanoTime()
        val fs = encoded.map { e =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = BlockCodec.decodeBlock(e).length.toLong
          })
        }
        fs.foreach(_.get())
        val s = (System.nanoTime() - t0) / 1e9
        rawBytes / s / 1e9
      } finally pool.shutdown() // a decode throw must not leak live threads
    }
  }

  /** Shared fixed input for the per-level encode probes: one generation
    * pass, blocks reused by every probe (content column only — the codec
    * CPU the encode legs measure).
    */
  private object EncodeProbeData {
    val rowsPerBlock = 4000
    val nBlocks = 64
    lazy val (blocks, rawBytes): (Array[Array[Array[Byte]]], Long) = {
      val cfg = DataGen.GenConfig(rows = rowsPerBlock.toLong * nBlocks)
      val bs = (0L until cfg.rows).toArray.map(i => DataGen.row(i, cfg))
        .grouped(rowsPerBlock).map(_.map(_.content.getBytes("UTF-8"))).toArray
      (bs, bs.map(_.map(_.length.toLong).sum).sum)
    }
  }

  /** Pure-JVM encode probe (no Spark): the encode-leg analog of
    * DecodeProbe. One timed rep = stats + codec-select + encodeBlock over
    * the fixed block set on `threads` threads, swept repeatedly until the
    * rep is long enough to time reliably at high thread counts. Taken
    * ADJACENT to each Spark encode rep at the SAME thread count, the
    * paired (spark / probe) ratio cancels BOTH the steal window and the
    * host's intrinsic thread plateau — the normalized scaling pairs then
    * measure how well the Spark job scales relative to the pure-JVM
    * ceiling at that core count, which is the number that extrapolates to
    * a real multi-executor cluster (no shared-core plateau there). Round-4
    * motivation: one steal window sank the driver-run local[32] leg to
    * 0.137 GB/s (slower than local[8]) with a 6x rep spread — the raw
    * number alone cannot defend itself.
    */
  private[graft] final class EncodeProbe(threads: Int) {
    import EncodeProbeData._
    gbpsOnce() // untimed JIT warmup (cold probes read 2-4x low)

    /** one timed probe rep: GB/s of the fixed block set right now */
    def gbpsOnce(): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        var done = 0L
        val t0 = System.nanoTime()
        var elapsed = 0.0
        var sweeps = 0
        // >=0.2s of work: a single sweep at 32 threads is ~0.1s and would
        // time mostly pool-scheduling jitter
        while (sweeps == 0 || (elapsed < 0.2 && sweeps < 8)) {
          val fs = blocks.zipWithIndex.map { case (b, i) =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long = {
                val codec = CodecSelector.select(BlockStats.compute("content", 0, b))
                BlockCodec.encodeBlock("content", 0, i, b, codec).encodedBytes
              }
            })
          }
          fs.foreach(_.get())
          done += rawBytes
          sweeps += 1
          elapsed = (System.nanoTime() - t0) / 1e9
        }
        done / elapsed / 1e9
      } finally pool.shutdown() // an encode throw must not leak live threads
    }
  }

  /** one timed encode pass: returns (rawBytes, encodedBytes, seconds).
    * Partition count fixed across levels: same job, same work units — only
    * the core count varies.
    */
  private def encodeRun(spark: SparkSession, inputPath: String, nParts: Int,
      skew: Option[Map[String, Int]] = None): (Long, Long, Double) = {
    val df = spark.read.parquet(inputPath)
    val cols = Seq("repo", "path", "commit", "lang", "content")
    val cfg = Encoder.EncodeConfig(numPartitions = nParts, blockRows = 16384)
    val (row, sec) = time {
      Encoder.encode(df, cols, Seq("repo", "path", "commit"), cfg, skew)
        .agg(sum(col("rawBytes")), sum(col("encodedBytes")))
        .first()
    }
    (row.getLong(0), row.getLong(1), sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // every N with 4N also measured gives an N→4N efficiency pair; level 2
    // buys a second low-end pair (2→8) so one steal-polluted window can't
    // sink the headline max
    val levels = Seq(1, 2, math.max(1, hi / 8), math.max(1, hi / 4), hi)
      .distinct.filter(_ <= hi)
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
    val benchRows = math.max(20000L, (sf * 8000000L).toLong)
    val nParts = 64
    // host CPU drifts ~2x between windows; cheap (multi-core) levels get
    // extra reps — their min decides the efficiency denominator
    def repsFor(level: Int): Int = if (level <= 2) 4 else 8
    val maxReps = levels.map(repsFor).max

    // ---- materialize the bench input once (shared by all levels) ----
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val inputPath = s"$tmp/input.parquet"
    var spark = session(hi)
    DataGen.table(spark, DataGen.GenConfig(rows = benchRows, parts = nParts))
      .write.mode("overwrite").parquet(inputPath)

    // ---- size bars (once, at hi parallelism) ----
    val input = spark.read.parquet(inputPath)
    val parquetSnappy = SizeBar.parquetSnappyBytes(input, tmp)
    val avroDeflate = SizeBar.avroDeflateBytes(input)

    // the salting plan is input metadata — computed once, reused by every
    // timed run (its sample job would otherwise add a serial-ish constant
    // to every measurement)
    val skew = Some(Encoder.skewPlan(spark.read.parquet(inputPath), "repo",
      Encoder.EncodeConfig(numPartitions = nParts)))
    // JIT warmup for the encode path
    val (rawBytes, encBytes, _) = encodeRun(spark, inputPath, nParts, skew)
    spark.stop()

    // ---- decode throughput at hi, in a FRESH session ----
    // running decode after the 80+ query executions understates it ~3.5x
    // (long-lived-session heap/GC state: full-bench decode measured 0.30
    // GB/s where the identical leg in a fresh session measured 1.05) —
    // so the decode leg gets a session with nothing before it
    spark = session(hi)
    val benchCols = Seq("repo", "path", "commit", "lang", "content")
    val cachedBlocks = Encoder.encode(spark.read.parquet(inputPath), benchCols,
      Seq("repo", "path", "commit"),
      Encoder.EncodeConfig(numPartitions = nParts, blockRows = 16384), skew).cache()
    cachedBlocks.count()
    graft.engine.Decoder.decode(cachedBlocks, benchCols).count() // warm
    // min of N timed reps, same discipline as encode (a single rep is
    // indistinguishable from a steal artifact), with one pure-JVM probe
    // rep taken ADJACENT to each decode rep; decode_normalized = median
    // of the paired (spark/probe) ratios. Honesty note: measured across
    // four windows, normalization compresses the raw 4.6x cross-window
    // decode spread to ~2.8x, not to 1 — severe steal slows the Spark
    // path (scheduling, GC) superlinearly vs the pure-JVM probe — so the
    // authoritative cross-round decode comparison is the BEST session
    // (floor metric in BASELINE.md), with normalized as the within-run
    // window indicator.
    val probe = new DecodeProbe(hi)
    val decodePairs = (1 to 4).map { _ =>
      val p = probe.gbpsOnce()
      val d = time(graft.engine.Decoder.decode(cachedBlocks, benchCols).count())._2
      (d, p)
    }
    val decodeSec = decodePairs.map(_._1).min
    val probeGbps = decodePairs.map(_._2).max
    val decodeNorm = {
      val rs = decodePairs.map { case (d, p) => (rawBytes / d / 1e9) / p }.sorted
      (rs(1) + rs(2)) / 2
    }
    cachedBlocks.unpersist()
    spark.stop()

    // ---- per-query timings on the driver tables (own session) ----
    // min-of-2 INTERLEAVED reps (rep 1 of every query, then rep 2): a slow
    // steal window hits one whole rep, and the per-query min recovers the
    // clean one — round 3's single-rep numbers manufactured seven phantom
    // 5-23x regressions that did not reproduce under controlled re-runs.
    // clearCache() between queries stops the cache()/persist()-holding
    // queries from cross-contaminating their neighbors' timings.
    spark = session(hi)
    val qFns = SparkEntry.queries.toSeq.sortBy(_._1)
    val qReps = scala.collection.mutable.Map.empty[String, List[Double]]
    for (rep <- 1 to 2; (name, fn) <- qFns) {
      spark.catalog.clearCache()
      // a failed query must NOT record its elapsed-until-throw as a timing
      // (a crash after 0.2 s would read as a speedup in cross-round
      // comparison) — the sentinel -1 survives the min and flags it loudly
      val (ok, sec) = time {
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      }
      qReps(name) = (if (ok) sec else -1.0) :: qReps.getOrElse(name, Nil)
    }
    val queryTimes = qFns.map { case (name, _) => name -> qReps(name).min }
    val querySpread = qFns.map { case (name, _) =>
      name -> (qReps(name).min, qReps(name).max)
    }
    spark.stop()

    // ---- interleaved multi-level throughput runs, min per level ----
    // per-session small untimed warmup absorbs session-cold costs (executor
    // init, codegen, file-index listing) that are not part of throughput.
    // Each timed Spark rep gets an ADJACENT pure-JVM encode probe rep at
    // the same thread count (the decode leg's paired-probe discipline): the
    // per-rep (spark / probe) ratio is the steal-window-resistant figure.
    val encProbes = levels.map(l => l -> new EncodeProbe(l)).toMap
    val reps = scala.collection.mutable.Map.empty[Int, List[Double]]
    val probeReps = scala.collection.mutable.Map.empty[Int, List[Double]]
    val ratioReps = scala.collection.mutable.Map.empty[Int, List[Double]]
    for (rep <- 1 to maxReps; level <- levels if repsFor(level) >= rep) {
      spark = session(level)
      val warm = spark.read.parquet(inputPath).limit(5000)
      Encoder.encode(warm, Seq("repo", "path", "commit", "lang", "content"),
        Seq("repo", "path", "commit"),
        Encoder.EncodeConfig(numPartitions = nParts), skew)
        .agg(sum(col("encodedBytes"))).first()
      val probeGbpsRep = encProbes(level).gbpsOnce()
      val (_, _, sec) = encodeRun(spark, inputPath, nParts, skew)
      spark.stop()
      reps(level) = sec :: reps.getOrElse(level, Nil)
      probeReps(level) = probeGbpsRep :: probeReps.getOrElse(level, Nil)
      ratioReps(level) = (rawBytes / sec / 1e9) / probeGbpsRep ::
        ratioReps.getOrElse(level, Nil)
    }
    val best = levels.map(l => l -> reps(l).min).toMap
    val th = levels.map(l => l -> rawBytes / best(l) / 1e9).toMap
    def eff(a: Int, b: Int): Double = th(b) / ((b.toDouble / a) * th(a))
    val effPairs = levels.filter(a => levels.contains(4 * a))
      .map(a => (a, 4 * a, eff(a, 4 * a)))
    // steal-normalized figures: median paired ratio per level (the decode
    // leg's discipline). The probe at the same thread count embodies both
    // the current window speed and the host's intrinsic thread plateau, so
    // normPairs(a->b) ~ 1.0 means the Spark job scaled as well as the
    // pure-JVM ceiling allows at b threads — the cluster-extrapolation
    // number, immune to a steal window hitting one leg.
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val encNorm = levels.map(l => l -> median(ratioReps(l))).toMap
    val probeBest = levels.map(l => l -> probeReps(l).max).toMap
    val normPairs = levels.filter(a => levels.contains(4 * a))
      .map(a => (a, 4 * a,
        if (encNorm(a) == 0) 0.0 else encNorm(4 * a) / encNorm(a)))
    val headlineNorm = normPairs.map(_._3).maxOption.getOrElse(0.0)
    // efficiency > 1.0 is physically impossible for the same job at more
    // cores — it means the denominator leg's best rep still sat in a slower
    // window than the numerator's. Flag those pairs and clamp the headline
    // so the >=0.8 bar can't be "met" (or sunk) by noise.
    val suspectPairs = effPairs.filter(_._3 > 1.0).map { case (a, b, _) => s"$a->$b" }

    val qs = queryTimes.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val qSpreadJson = querySpread.map { case (k, (mn, mx)) =>
      s""""$k":{"min":$mn,"max":$mx}"""
    }.mkString("{", ",", "}")
    val thJson = levels.map(l => s""""local[$l]":${th(l)}""").mkString("{", ",", "}")
    val probeJson = levels.map(l => s""""local[$l]":${probeBest(l)}""").mkString("{", ",", "}")
    val normJson = levels.map(l => s""""local[$l]":${encNorm(l)}""").mkString("{", ",", "}")
    val normPairsJson = normPairs.map { case (a, b, e) => s""""${a}->${b}":$e""" }
      .mkString("{", ",", "}")
    val secJson = levels.map(l => s""""local[$l]":${best(l)}""").mkString("{", ",", "}")
    val secSpreadJson = levels.map(l =>
      s""""local[$l]":{"min":${reps(l).min},"max":${reps(l).max}}""")
      .mkString("{", ",", "}")
    val effJson = effPairs.map { case (a, b, e) => s""""${a}->${b}":$e""" }.mkString("{", ",", "}")
    // maxOption: when SPARK_GRAFT_CPUS < 4 there is no N→4N pair at all —
    // still print the contract JSON line rather than crash
    val headlineEffRaw = effPairs.map(_._3).maxOption.getOrElse(0.0)
    // headline = best CREDIBLE pair: prefer the max over non-suspect pairs
    // (a >1.0 pair proves its own denominator was noise); only when every
    // pair is suspect does the clamped raw stand in
    val headlineEff = effPairs.map(_._3).filter(_ <= 1.0).maxOption
      .getOrElse(math.min(1.0, headlineEffRaw))
    val decodeGbps = rawBytes / decodeSec / 1e9
    val json =
      s"""{"metric":"encode_throughput_gbps","value":${th(hi)},"unit":"GB/s",""" +
        s""""queries":$qs,"sf":"$sfDir",""" +
        s""""query_spread":$qSpreadJson,""" +
        s""""bench_rows":$benchRows,"raw_bytes":$rawBytes,"encoded_bytes":$encBytes,""" +
        s""""compression_ratio":${rawBytes.toDouble / math.max(1, encBytes)},""" +
        s""""parquet_snappy_bytes":$parquetSnappy,"avro_deflate_bytes":$avroDeflate,""" +
        s""""beats_parquet_snappy":${encBytes <= parquetSnappy},""" +
        s""""beats_avro_deflate":${encBytes <= avroDeflate},""" +
        s""""throughput_gbps":$thJson,"seconds":$secJson,""" +
        s""""seconds_spread":$secSpreadJson,""" +
        s""""decode_gbps":$decodeGbps,""" +
        s""""decode_probe_gbps":$probeGbps,""" +
        s""""decode_normalized":$decodeNorm,""" +
        s""""encode_probe_gbps":$probeJson,""" +
        s""""encode_normalized":$normJson,""" +
        s""""scaling_normalized_pairs":$normPairsJson,""" +
        s""""scaling_efficiency_normalized":$headlineNorm,""" +
        s""""scaling_efficiency_pairs":$effJson,""" +
        s""""window_suspect_pairs":${suspectPairs.map(p => s""""$p"""").mkString("[", ",", "]")},""" +
        s""""scaling_efficiency_raw":$headlineEffRaw,""" +
        s""""scaling_efficiency":$headlineEff}"""
    println(json)

    // evidence file for BASELINE.md's two-cluster-size criterion
    // extra leading '|' = stripMargin margin (runs after interpolation)
    val effLines = effPairs.map { case (a, b, e) =>
      val flag = if (e > 1.0) " — WINDOW SUSPECT (>1.0 is physically impossible; the small-core leg hit a slower steal window)" else ""
      f"|| scaling efficiency local[$a]→local[$b] (cores ×${b / a}) | $e%.3f$flag |"
    }.mkString("\n")
    val thLines = levels.map(l =>
      f"|| throughput local[$l] | ${th(l)}%.3f GB/s (${best(l)}%.2f s, min of ${repsFor(l)} interleaved, rep spread ${reps(l).min}%.2f–${reps(l).max}%.2f s; pure-JVM probe ${probeBest(l)}%.3f GB/s, median paired spark/probe ${encNorm(l)}%.3f) |")
      .mkString("\n")
    val normLines = normPairs.map { case (a, b, e) =>
      f"|| normalized scaling local[$a]→local[$b] (spark/probe ratio, steal- and plateau-immune) | $e%.3f |"
    }.mkString("\n")
    val md =
      s"""# BENCH — encode throughput & scaling (generated by graft.Bench)
         |
         |Input: $benchRows generated rows, $rawBytes raw bytes, $nParts partitions
         |(identical job + input at every level; levels interleaved, min taken —
         |this host's effective CPU fluctuates under hypervisor steal).
         |
         || metric | value |
         ||---|---|
         || encoded bytes | $encBytes (${f"${rawBytes.toDouble / math.max(1, encBytes)}%.2f"}x) |
         || parquet-snappy bar | $parquetSnappy (beat: ${encBytes <= parquetSnappy}) |
         || avro-deflate bar | $avroDeflate (beat: ${encBytes <= avroDeflate}) |
         || decode throughput local[$hi] | ${f"$decodeGbps%.3f"} GB/s (min of 4 in-session) |
         || decode probe (pure-JVM, $hi threads) | ${f"$probeGbps%.3f"} GB/s — same-session host yardstick |
         || decode normalized (median paired spark/probe) | ${f"$decodeNorm%.3f"} — cross-window-stable figure |
         || headline scaling efficiency | ${f"$headlineEff%.3f"} (raw ${f"$headlineEffRaw%.3f"}; pairs >1.0 flagged window-suspect) |
         || headline NORMALIZED scaling | ${f"$headlineNorm%.3f"} — median paired (spark/probe) ratio of the 4N level over the N level; the probe at the same thread count absorbs both steal windows and the host's 32-thread plateau, so this is the figure that extrapolates to independent executors |
         $thLines
         $effLines
         $normLines
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.md"), md)

    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    } catch { case _: Throwable => }
  }
}
