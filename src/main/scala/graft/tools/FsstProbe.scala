package graft.tools

import graft.codec.Fsst
import graft.gen.DataGen

/** one-off: branch distribution of the FSST encode matcher on content */
object FsstProbe {
  def main(args: Array[String]): Unit = {
    val rows = 20000
    val cfg = DataGen.GenConfig(rows = rows)
    val vals = (0L until rows).map(i => DataGen.row(i, cfg).content.getBytes("UTF-8")).toArray
    val table = new Fsst.Table(Fsst.train(vals))
    val combo = table.comboArr
    var total = 0L; var twoByteHit = 0L; var oneByteFallback = 0L; var escape = 0L
    var noCand = 0L // pair has NO len≥3 group — the scan-skip rate
    vals.foreach { v =>
      var pos = 0
      while (pos < v.length) {
        total += 1
        if (pos + 1 < v.length) {
          val pair = ((v(pos) & 0xff) << 8) | (v(pos + 1) & 0xff)
          if ((combo(pair) >>> 16) == 0) noCand += 1
        }
        val p = table.findLongestPacked(v, pos, v.length)
        if (p >= 0) {
          if ((p & 0xff) >= 2) twoByteHit += 1 else oneByteFallback += 1
          pos += p & 0xff
        } else { escape += 1; pos += 1 }
      }
    }
    println(s"[probe] positions=$total multi=${twoByteHit} (${100.0*twoByteHit/total}%) " +
      s"one=${oneByteFallback} (${100.0*oneByteFallback/total}%) esc=${escape} (${100.0*escape/total}%) " +
      s"no-candidate-pair=${noCand} (${100.0*noCand/total}%)")
  }
}
