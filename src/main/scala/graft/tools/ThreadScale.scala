package graft.tools

import graft.engine.BlockCodec
import graft.gen.DataGen
import graft.plan.CodecSelector
import graft.stats.BlockStats

/** Pure-JVM thread-scaling probe: encode the same blocks on k threads, no
  * Spark. Usage: runMain graft.tools.ThreadScale [rowsPerBlock] [blocks]
  */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    val rowsPerBlock = if (args.length > 0) args(0).toInt else 8000
    val nBlocks = if (args.length > 1) args(1).toInt else 64
    val cfg = DataGen.GenConfig(rows = rowsPerBlock.toLong * nBlocks)
    println(s"[ts] generating ${cfg.rows} rows...")
    val rows = (0L until cfg.rows).toArray.map(i => DataGen.row(i, cfg))
    val blocks: Array[Array[Array[Byte]]] = rows.grouped(rowsPerBlock).map { g =>
      g.map(_.content.getBytes("UTF-8"))
    }.toArray
    val raw = blocks.map(_.map(_.length.toLong).sum).sum
    println(f"[ts] raw=${raw / 1e6}%.1fMB in ${blocks.length} blocks")

    for (threads <- Seq(8, 2, 8, 32, 16, 32, 2)) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futures = blocks.zipWithIndex.map { case (b, i) =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            val codec = CodecSelector.select(BlockStats.compute("content", 0, b))
            BlockCodec.encodeBlock("content", 0, i, b, codec).encodedBytes
          }
        })
      }
      val enc = futures.map(_.get()).sum
      val sec = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      println(f"[ts] threads=$threads%2d  ${sec}%6.2fs  ${raw / sec / 1e6}%8.1f MB/s  enc=${enc / 1e6}%.1fMB")
    }
  }
}
