package graft.codec

import graft.model.WrapId
import java.util.zip.{Deflater, Inflater}

/** General-compressor layer over an encoded block container — the analog of
  * the reference stacking GZIP on top of Parquet dictionary encoding
  * (reference: parquet/IonToParquet.java:186-188). Zstd comes from the
  * Spark classpath (zstd-jni); Deflate from the JDK.
  */
object Wrap {

  def compress(wrapId: Byte, data: Array[Byte], zstdLevel: Int = 3): Array[Byte] = wrapId match {
    case WrapId.None => data
    case WrapId.Zstd =>
      val w = new ByteWriter(data.length / 2 + 16)
      w.writeVarInt(data.length)
      w.writeBytes(com.github.luben.zstd.Zstd.compress(data, zstdLevel))
      w.result()
    case WrapId.Deflate =>
      val w = new ByteWriter(data.length / 2 + 16)
      w.writeVarInt(data.length)
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(data); d.finish()
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        w.writeBytes(buf, 0, n)
      }
      d.end()
      w.result()
    case other => throw new IllegalArgumentException(s"unknown wrap id $other")
  }

  def decompress(wrapId: Byte, data: Array[Byte]): Array[Byte] =
    decompress(wrapId, data, 0)

  /** decompress starting at `off` (the block container sits after the
    * membership-filter header inside EncodedBlock.data)
    */
  def decompress(wrapId: Byte, data: Array[Byte], off: Int): Array[Byte] = wrapId match {
    case WrapId.None =>
      if (off == 0) data
      else java.util.Arrays.copyOfRange(data, off, data.length)
    case WrapId.Zstd =>
      val r = new ByteReader(data, off)
      val origLen = r.readVarInt()
      com.github.luben.zstd.Zstd.decompress(r.readBytes(r.remaining), origLen)
    case WrapId.Deflate =>
      val r = new ByteReader(data, off)
      val origLen = r.readVarInt()
      val inf = new Inflater(true)
      inf.setInput(r.readBytes(r.remaining))
      val out = new Array[Byte](origLen)
      var done = 0
      while (done < origLen && !inf.finished()) {
        val n = inf.inflate(out, done, origLen - done)
        // inflate returns 0 with needsInput on truncated/corrupt data —
        // must throw (not spin) so the decode bad-block policy can act
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
          inf.end()
          throw new IllegalStateException(
            s"truncated deflate stream at $done/$origLen bytes")
        }
        done += n
      }
      inf.end()
      require(done == origLen, s"deflate underflow: $done != $origLen")
      out
    case other => throw new IllegalArgumentException(s"unknown wrap id $other")
  }
}
