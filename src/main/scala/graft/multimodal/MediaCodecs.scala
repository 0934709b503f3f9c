package graft.multimodal

/** Pure-JVM media codecs for the formats that need no external libraries:
  * binary PPM (P6) images, PCM16 mono WAV audio, and Y4M (YUV4MPEG2)
  * video — all fully public, trivially specified container formats. These
  * make the multimodal decode path REAL for image/audio/video (compressed
  * codecs like JPEG/MP3/H.264 would need libraries this container does not
  * ship).
  */
object MediaCodecs {

  // ---------------------------------------------------------------- PPM P6

  /** encode w×h RGB (3 bytes/pixel, row-major) as binary PPM */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"need ${3 * w * h} bytes, got ${rgb.length}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** strict P6 parse (maxval 255, `#` comments allowed) → (w, h, rgb) */
  def decodePpm(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    var i = 0
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      if (!any) -1 else v
    }
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    i = 2
    val w = int(); val h = int(); val maxv = int()
    if (w <= 0 || h <= 0 || maxv != 255 || i >= b.length) return None
    i += 1 // exactly one whitespace byte after maxval
    // long arithmetic: a forged header like `1 805306368` overflows the Int
    // product to a NEGATIVE need, which slips the length guard and crashes
    // copyOfRange — a corrupt payload must yield None, never a task failure
    val need = 3L * w * h
    if (need > Int.MaxValue || b.length - i < need) return None
    Some((w, h, java.util.Arrays.copyOfRange(b, i, i + need.toInt)))
  }

  /** nearest-neighbor resample to w2×h2; None when the input is not PPM */
  def resizePpmNearest(b: Array[Byte], w2: Int, h2: Int): Option[Array[Byte]] =
    decodePpm(b).map { case (w, h, rgb) =>
      val out = new Array[Byte](3 * w2 * h2)
      var y = 0
      while (y < h2) {
        val sy = (y.toLong * h / h2).toInt
        var x = 0
        while (x < w2) {
          val sx = (x.toLong * w / w2).toInt
          val s = 3 * (sy * w + sx)
          val d = 3 * (y * w2 + x)
          out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
          x += 1
        }
        y += 1
      }
      encodePpm(w2, h2, out)
    }

  /** 16-bin luminance histogram, normalized by pixel count */
  def ppmLumaHistogram(b: Array[Byte], bins: Int): Option[Array[Float]] =
    decodePpm(b).map { case (w, h, rgb) =>
      val hist = new Array[Float](bins)
      var p = 0
      while (p < rgb.length) {
        val lum = ((rgb(p) & 0xff) * 299 + (rgb(p + 1) & 0xff) * 587 +
          (rgb(p + 2) & 0xff) * 114) / 1000
        hist(math.min(bins - 1, lum * bins / 256)) += 1f
        p += 3
      }
      val n = math.max(1, w * h)
      var k = 0
      while (k < bins) { hist(k) /= n; k += 1 }
      hist
    }

  // ---------------------------------------------------------- WAV (PCM16)

  /** mono PCM16 little-endian WAV */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** parse mono PCM16 WAV (walks RIFF chunks) → (sampleRate, samples) */
  def decodeWav(b: Array[Byte]): Option[(Int, Array[Short])] = {
    if (b.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    bb.getInt
    if (tag() != "WAVE") return None
    var rate = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && (rate < 0 || samples == null)) {
      val t = tag()
      val len = bb.getInt
      if (len < 0 || len > bb.remaining()) return None
      t match {
        case "fmt " =>
          // the declared length must cover the 16 PCM fields read below —
          // a truncated fmt chunk at the buffer's end would underflow
          if (len < 16) return None
          val fmt = bb.getShort
          val channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort
          val bits = bb.getShort
          if (fmt != 1 || channels != 1 || bits != 16) return None
          bb.position(bb.position() + len - 16)
        case "data" =>
          samples = new Array[Short](len / 2)
          var k = 0
          while (k < samples.length) { samples(k) = bb.getShort; k += 1 }
          // an ODD data length leaves its last declared byte unread (shorts
          // consume len - 1); skip it so the cursor sits at chunk end and
          // the word-align pad below lands on the right byte
          bb.position(bb.position() + (len & 1))
        case _ => bb.position(bb.position() + len)
      }
      // RIFF chunks are word-aligned: an odd-length chunk is followed by a
      // pad byte NOT counted in len — skipping it keeps the walk aligned
      // (real-world LIST/INFO chunks are routinely odd-sized)
      if ((len & 1) == 1 && bb.remaining() >= 1)
        bb.position(bb.position() + 1)
    }
    if (rate > 0 && samples != null) Some((rate, samples)) else None
  }

  /** per-window RMS amplitude (bins equal windows, samples scaled to ±1) */
  def wavRmsWindows(b: Array[Byte], bins: Int): Option[Array[Float]] =
    decodeWav(b).map { case (_, samples) =>
      val out = new Array[Float](bins)
      if (samples.nonEmpty) {
        val per = math.max(1, samples.length / bins)
        var w = 0
        while (w < bins) {
          val from = w * per
          val to = math.min(samples.length, from + per)
          var acc = 0.0
          var k = from
          while (k < to) {
            val v = samples(k) / 32768.0
            acc += v * v
            k += 1
          }
          out(w) = if (to > from) math.sqrt(acc / (to - from)).toFloat else 0f
          w += 1
        }
      }
      out
    }

  // ------------------------------------------------------- Y4M (YUV4MPEG2)

  /** encode frames (each 3*w*h bytes: planar YUV 4:4:4) as a YUV4MPEG2
    * stream: `YUV4MPEG2 W# H# F#:# Ip A1:1 C444\n` then per frame
    * `FRAME\n` + planes. Uncompressed, fully public, trivially specified —
    * the video analog of PPM/WAV above.
    */
  def encodeY4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      frames: Array[Array[Byte]]): Array[Byte] = {
    val frameLen = 3 * w * h
    require(frames.forall(_.length == frameLen),
      s"each C444 frame needs $frameLen bytes")
    val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C444\n"
      .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](
      header.length + frames.length * (marker.length + frameLen))
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    frames.foreach { f =>
      System.arraycopy(marker, 0, out, pos, marker.length)
      pos += marker.length
      System.arraycopy(f, 0, out, pos, frameLen)
      pos += frameLen
    }
    out
  }

  final case class Y4mHeader(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      colorspace: String, headerLen: Int) {
    def frameLen: Int = {
      // long arithmetic: forged giant W/H would wrap the Int product to a
      // positive-but-wrong value and silently misalign every frame slice
      val fl: Long = colorspace match {
        // chroma planes use CEIL(w/2)/CEIL(h/2) — `w*h*3/2` is wrong for odd
        // dimensions (legal in Y4M) and would silently misalign frame offsets
        case "C444" => 3L * w * h
        case "C420" | "C420jpeg" | "C420paldv" | "C420mpeg2" =>
          w.toLong * h + 2L * (((w + 1) / 2).toLong * ((h + 1) / 2))
        case "C422" => w.toLong * h + 2L * (((w + 1) / 2).toLong * h)
        case _ => -1L
      }
      if (fl < 0 || fl > Int.MaxValue) -1 else fl.toInt
    }
  }

  /** parse the stream header line; None for non-Y4M payloads */
  def decodeY4mHeader(b: Array[Byte]): Option[Y4mHeader] = {
    val magic = "YUV4MPEG2"
    if (b.length < magic.length + 1) return None
    var i = 0
    while (i < magic.length) {
      if (b(i) != magic.charAt(i)) return None
      i += 1
    }
    var end = i
    while (end < b.length && b(end) != '\n') end += 1
    if (end >= b.length) return None
    val params = new String(b, i, end - i, "US-ASCII").trim.split("\\s+")
    var w = -1; var h = -1; var fn = 30; var fd = 1; var cs = "C420"
    params.foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = p.drop(1).toIntOption.getOrElse(-1)
        case 'F' => p.drop(1).split(":") match {
          case Array(n, d) =>
            fn = n.toIntOption.getOrElse(30); fd = d.toIntOption.getOrElse(1)
          case _ =>
        }
        case 'C' => cs = p
        case _ => // Ip / A1:1 / X extensions — irrelevant to frame layout
      }
    }
    if (w <= 0 || h <= 0) None
    else Some(Y4mHeader(w, h, fn, fd, cs, end + 1))
  }

  /** frame offsets: each frame is `FRAME[ params]\n` + frameLen bytes */
  def y4mFrameOffsets(b: Array[Byte], hdr: Y4mHeader): Seq[Int] = {
    val fl = hdr.frameLen
    if (fl <= 0) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var pos = hdr.headerLen
    while (pos + 5 <= b.length) {
      // FRAME marker, optionally with parameters up to '\n'
      if (b(pos) != 'F' || b(pos + 1) != 'R' || b(pos + 2) != 'A' ||
          b(pos + 3) != 'M' || b(pos + 4) != 'E') return out.toSeq
      var nl = pos + 5
      while (nl < b.length && b(nl) != '\n') nl += 1
      // long sum: nl + 1 + fl can exceed Int for a near-2GiB frameLen
      if (nl >= b.length || nl + 1L + fl > b.length) return out.toSeq
      out += nl + 1
      pos = nl + 1 + fl
    }
    out.toSeq
  }

  /** decode the whole stream → (header, frames of frameLen bytes each) */
  def decodeY4m(b: Array[Byte]): Option[(Y4mHeader, Array[Array[Byte]])] =
    decodeY4mHeader(b).filter(_.frameLen > 0).map { hdr =>
      val frames = y4mFrameOffsets(b, hdr).map(off =>
        java.util.Arrays.copyOfRange(b, off, off + hdr.frameLen)).toArray
      (hdr, frames)
    }

  /** luma histogram of one raw frame (Y plane = first w*h bytes in every
    * supported colorspace)
    */
  def y4mLumaHistogram(frame: Array[Byte], w: Int, h: Int,
      bins: Int): Array[Float] = {
    val out = new Array[Float](bins)
    val n = math.min(frame.length, w * h)
    var i = 0
    while (i < n) {
      out(((frame(i) & 0xff) * bins) >> 8) += 1f
      i += 1
    }
    if (n > 0) { var d = 0; while (d < bins) { out(d) /= n; d += 1 } }
    out
  }
}
