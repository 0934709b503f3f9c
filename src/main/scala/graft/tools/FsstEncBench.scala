package graft.tools

import graft.codec.Fsst
import graft.gen.DataGen

/** Focused FSST encode microbench: trains one table on generated content,
  * then times encodeWithTable over many reps and prints the min — the
  * host's steal windows make any single-rep (or single-run) comparison of
  * encode variants meaningless; compare variants by ABAB-interleaving
  * sbt invocations and reading each run's min.
  *
  * Usage: sbt "runMain graft.tools.FsstEncBench [rows] [reps]"
  */
object FsstEncBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 50000
    val reps = if (args.length > 1) args(1).toInt else 10
    val cfg = DataGen.GenConfig(rows = rows)
    val vals = (0L until rows).map(i =>
      DataGen.row(i, cfg).content.getBytes("UTF-8")).toArray
    val raw = vals.map(_.length.toLong).sum
    val table = new Fsst.Table(Fsst.train(vals))
    var out = 0L
    (1 to 3).foreach(_ => out = Fsst.encodeWithTable(table, vals)._2.length) // JIT
    val secs = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      out = Fsst.encodeWithTable(table, vals)._2.length
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[fsstenc] raw=${raw / 1e6}%.1fMB out=${out / 1e6}%.1fMB " +
      f"min=${raw / secs.min / 1e6}%.1f MB/s " +
      f"reps=${secs.map(s => f"${raw / s / 1e6}%.0f").mkString(",")}")
    // the other encode-path CPU pieces, same min-of-N discipline
    var sink = 0L
    (1 to 3).foreach(_ => sink += graft.stats.BlockStats.compute("content", 0, vals).ndv)
    val statsSecs = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      sink += graft.stats.BlockStats.compute("content", 0, vals).ndv
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[stats]   min=${raw / statsSecs.min / 1e6}%.1f MB/s " +
      f"reps=${statsSecs.map(s => f"${raw / s / 1e6}%.0f").mkString(",")} (sink=$sink)")
    val zin = Fsst.encodeWithTable(table, vals)._2
    (1 to 3).foreach(_ => sink += com.github.luben.zstd.Zstd.compress(zin, 3).length)
    val zSecs = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      sink += com.github.luben.zstd.Zstd.compress(zin, 3).length
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[zstd3]   min=${zin.length / zSecs.min / 1e6}%.1f MB/s over FSST output " +
      f"(${raw / zSecs.min / 1e6}%.1f MB/s of raw)")
  }
}
