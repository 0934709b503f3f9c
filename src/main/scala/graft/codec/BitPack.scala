package graft.codec

/** Fixed-width bit-packing of non-negative longs, LSB-first within a
  * little-endian 64-bit accumulator. Width 0 encodes the all-zero vector
  * in zero bytes (constant blocks cost nothing).
  */
object BitPack {

  /** bits needed to represent maxVal (>= 0); 0 when maxVal == 0 */
  def width(maxVal: Long): Int = {
    require(maxVal >= 0, s"bit-pack width needs non-negative max, got $maxVal")
    64 - java.lang.Long.numberOfLeadingZeros(maxVal)
  }

  def packedBytes(n: Int, w: Int): Int = ((n.toLong * w + 7) / 8).toInt

  def pack(vals: Array[Long], w: Int): Array[Byte] = {
    if (w == 0) return Array.emptyByteArray
    val out = new Array[Byte](packedBytes(vals.length, w))
    var acc = 0L
    var accBits = 0
    var outPos = 0
    var i = 0
    while (i < vals.length) {
      val v = vals(i)
      val fit = 64 - accBits
      if (w <= fit) {
        acc |= (if (accBits == 64) 0L else v << accBits)
        accBits += w
      } else {
        acc |= v << accBits // low `fit` bits land; high bits shift out
        // acc is full to 64 bits of content only up to accBits+fit == 64
        var drained = 0
        while (drained < 8) { // flush the full 64-bit accumulator
          out(outPos) = acc.toByte; outPos += 1; acc >>>= 8; drained += 1
        }
        acc = v >>> fit
        accBits = w - fit
      }
      while (accBits >= 8) {
        out(outPos) = acc.toByte
        outPos += 1
        acc >>>= 8
        accBits -= 8
      }
      i += 1
    }
    if (accBits > 0) out(outPos) = acc.toByte
    out
  }

  def unpack(bytes: Array[Byte], w: Int, n: Int): Array[Long] = {
    val out = new Array[Long](n)
    if (w == 0) return out
    var acc = 0L
    var accBits = 0
    var inPos = 0
    val mask = if (w == 64) -1L else (1L << w) - 1L
    var i = 0
    while (i < n) {
      while (accBits < w && accBits <= 56) {
        acc |= (bytes(inPos).toLong & 0xffL) << accBits
        inPos += 1
        accBits += 8
      }
      if (accBits >= w) {
        out(i) = acc & mask
        acc = if (w == 64) 0L else acc >>> w // JVM shifts are mod 64
        accBits -= w
        i += 1
      } else {
        // w in (56, 64]: assemble from the residue plus following bytes
        var v = acc
        var got = accBits
        acc = 0L; accBits = 0
        while (got < w) {
          val b = bytes(inPos).toLong & 0xffL
          inPos += 1
          if (got + 8 <= w) { v |= b << got; got += 8 }
          else {
            val take = w - got
            v |= (b & ((1L << take) - 1L)) << got
            acc = b >>> take
            accBits = 8 - take
            got = w
          }
        }
        out(i) = v & mask
        i += 1
      }
    }
    out
  }
}
