package graft.tools

import graft.codec._
import graft.engine.BlockCodec
import graft.gen.DataGen
import graft.plan.CodecSelector
import graft.stats.BlockStats

/** Pure-JVM codec microbenchmark (no Spark): MB/s per codec per column on
  * generator output. Usage: sbt "runMain graft.tools.Profile [rows]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 20000
    val cfg = DataGen.GenConfig(rows = rows)
    val data = (0L until rows).map(i => DataGen.row(i, cfg)).toArray
    val cols: Map[String, Array[Array[Byte]]] = Map(
      "repo" -> data.map(_.repo.getBytes("UTF-8")),
      "path" -> data.map(_.path.getBytes("UTF-8")),
      "commit" -> data.map(_.commit.getBytes("UTF-8")),
      "lang" -> data.map(_.lang.getBytes("UTF-8")),
      "content" -> data.map(_.content.getBytes("UTF-8")))

    def mb(vals: Array[Array[Byte]]): Double = vals.map(_.length.toLong).sum / 1e6

    def bench(name: String, raw: Double)(f: => Long): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      val out = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s raw=${raw}%8.2fMB out=${out / 1e6}%8.2fMB " +
        f"ratio=${raw * 1e6 / out}%6.2fx ${raw / sec}%8.1f MB/s")
    }

    for ((cn, vals) <- cols.toSeq.sortBy(_._1)) {
      val raw = mb(vals)
      val stats = BlockStats.compute(cn, 0, vals)
      val chosen = CodecSelector.select(stats)
      println(s"== $cn: selector -> ${graft.model.CodecId.name(chosen.id)} " +
        s"(ndv=${stats.ndv} avgLen=${f"${stats.avgLen}%.1f"} maxRun=${stats.maxRun})")
      bench(s"$cn/stats", raw) { BlockStats.compute(cn, 0, vals); 0L }
      for (codec <- Seq[Codec](PlainCodec, RleCodec, DictCodec, Fsst) ++
          (if (ForLongCodec.accepts(vals)) Seq(ForLongCodec) else Nil) ++
          (if (HexPackCodec.accepts(vals)) Seq(HexPackCodec) else Nil)) {
        bench(s"$cn/${graft.model.CodecId.name(codec.id)}", raw) {
          val (m, p) = codec.encode(vals)
          m.length.toLong + p.length
        }
        // codec + zstd layer: the wrapped-block size this codec would yield
        val (m, p) = codec.encode(vals)
        val buf = new ByteWriter(m.length + p.length + 8)
        buf.writeVarInt(m.length); buf.writeBytes(m); buf.writeBytes(p)
        val z = com.github.luben.zstd.Zstd.compress(buf.result(), 3)
        println(f"  ${graft.model.CodecId.name(codec.id)}%-8s+zstd3 -> ${z.length / 1e6}%8.3fMB " +
          f"(${raw * 1e6 / z.length}%6.2fx)")
      }
      bench(s"$cn/block(full)", raw) {
        BlockCodec.encodeBlock(cn, 0, 0, vals, chosen).encodedBytes
      }
      if (cn == "content") {
        bench(s"$cn/fsst-train-only", raw) { Fsst.train(vals).length.toLong }
      }
      // decode speed of the chosen codec
      val (m, p) = chosen.encode(vals)
      bench(s"$cn/decode(${graft.model.CodecId.name(chosen.id)})", raw) {
        chosen.decode(m, p, vals.length).length.toLong
      }
      // zstd-only reference
      bench(s"$cn/zstd3-concat", raw) {
        val w = new ByteWriter((raw * 1.1e6).toInt + 64)
        vals.foreach { v => w.writeVarInt(v.length); w.writeBytes(v) }
        com.github.luben.zstd.Zstd.compress(w.result(), 3).length.toLong
      }
    }
  }
}
