package graft.codec

import java.util.Arrays

/** Growable byte sink with LEB128 varints. Pure JVM, zero Spark imports
  * (unit-testable in isolation, mirroring the reference's converter layer
  * being testable without the task harness).
  */
final class ByteWriter(initialCapacity: Int = 64) {
  private var buf = new Array[Byte](math.max(16, initialCapacity))
  private var len = 0

  private def ensure(n: Int): Unit = {
    val need = len + n
    if (need < 0) // Int overflow: one sink cannot hold >= 2 GiB
      throw new IllegalStateException(
        s"ByteWriter overflow: $len + $n exceeds the 2 GiB array limit")
    if (need > buf.length) {
      // the doubling wraps negative past 2^30 (cap<<1 -> Int.MinValue -> 0)
      // and would spin forever — clamp to the VM's max array size and let
      // the allocation fail loudly if even that is too small
      var cap = buf.length
      while (cap < need && cap > 0) cap <<= 1
      if (cap < need || cap < 0) cap = Integer.MAX_VALUE - 8
      buf = Arrays.copyOf(buf, cap)
    }
  }

  def size: Int = len

  def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }

  def writeBytes(bs: Array[Byte]): Unit = writeBytes(bs, 0, bs.length)

  def writeBytes(bs: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n); System.arraycopy(bs, off, buf, len, n); len += n
  }

  /** unsigned LEB128 */
  def writeVarLong(v0: Long): Unit = {
    var v = v0
    ensure(10)
    while ((v & ~0x7fL) != 0L) {
      buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1
      v >>>= 7
    }
    buf(len) = v.toByte; len += 1
  }

  def writeVarInt(v: Int): Unit = writeVarLong(v.toLong & 0xffffffffL)

  /** zigzag + LEB128 for signed values */
  def writeZigZag(v: Long): Unit = writeVarLong((v << 1) ^ (v >> 63))

  def result(): Array[Byte] = Arrays.copyOf(buf, len)

  /** reuse the writer (keeps capacity) */
  def clear(): Unit = len = 0

  /** append this writer's content to another without an intermediate copy */
  def writeTo(other: ByteWriter): Unit = other.writeBytes(buf, 0, len)
}

/** Offset-tracking reader over a byte array. */
final class ByteReader(val buf: Array[Byte], private var pos: Int = 0) {
  def position: Int = pos
  def remaining: Int = buf.length - pos
  def hasRemaining: Boolean = pos < buf.length

  def readByte(): Int = { val b = buf(pos) & 0xff; pos += 1; b }

  def readBytes(n: Int): Array[Byte] = {
    val out = Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
  }

  def skip(n: Int): Unit = pos += n

  def readVarLong(): Long = {
    var shift = 0
    var v = 0L
    var b = 0
    while ({ b = buf(pos) & 0xff; pos += 1; (b & 0x80) != 0 }) {
      v |= (b & 0x7fL) << shift
      shift += 7
    }
    v | (b.toLong << shift)
  }

  def readVarInt(): Int = readVarLong().toInt

  def readZigZag(): Long = {
    val v = readVarLong()
    (v >>> 1) ^ -(v & 1L)
  }
}

/** Byte-array hash key: content hashCode/equals for HashMap/HashSet use
  * (raw arrays hash by identity). One shared implementation — DictCodec
  * interning, FSST training counts, and BlockStats NDV all key on it.
  * `idx` is scratch space for interning callers (DictCodec); set/count
  * callers leave it at -1.
  */
private[graft] final class ByteKey(val bytes: Array[Byte]) {
  var idx: Int = -1
  private val h = Arrays.hashCode(bytes)
  override def hashCode: Int = h
  override def equals(o: Any): Boolean = o match {
    case k: ByteKey => Arrays.equals(bytes, k.bytes)
    case _ => false
  }
}
