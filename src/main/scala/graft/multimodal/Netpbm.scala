package graft.multimodal

/** Pure-JVM binary netpbm codec — P5 (PGM, grayscale) and P6 (PPM,
  * RGB). The family's codec work is all in the HEADER, not the
  * raster: the magic is followed by three ASCII integers (width,
  * height, maxval) separated by arbitrary whitespace runs, with
  * `#`-to-end-of-line comments legal anywhere a whitespace may
  * appear, and the raster starts after EXACTLY ONE whitespace byte
  * following maxval (a second byte is already pixel data — the
  * classic netpbm off-by-one). Samples are 1 byte when maxval ≤ 255
  * and 2 bytes BIG-endian when 256 ≤ maxval ≤ 65535 (the 16-bit PGM
  * wrinkle). Encoder + decoder both live here so planted corpora are
  * REAL format bytes walked by a REAL tokenizer.
  *
  * Format reference: the public netpbm format specs (pgm(5)/ppm(5));
  * the reference repo has no image handling.
  */
object Netpbm {

  /** Decoded raster: channel-interleaved samples in [0, maxval]. */
  final case class Decoded(magic: Int, width: Int, height: Int,
      maxval: Int, samples: Array[Int]) {
    def channels: Int = if (magic == 6) 3 else 1
  }

  /** Decode bound: reject dims whose sample count could OOM a task. */
  private val MaxSamples = 1 << 21

  /** Encode a P5 (gray) or P6 (rgb) image.
    *
    * @param magic 5 or 6
    * @param samples top-down interleaved, each in [0, maxval]
    * @param comment when nonempty, planted as TWO comment lines (one
    *   after the magic, one between height and maxval) so decoders
    *   must handle comments at several token boundaries
    */
  def encode(magic: Int, w: Int, h: Int, maxval: Int,
      samples: Array[Int], comment: String = ""): Array[Byte] = {
    require(magic == 5 || magic == 6, "magic must be 5 (PGM) or 6 (PPM)")
    val ch = if (magic == 6) 3 else 1
    require(samples.length == w * h * ch, "samples must be w*h*channels")
    require(maxval >= 1 && maxval <= 65535, "maxval out of range")
    require(samples.forall(v => v >= 0 && v <= maxval),
      "sample out of range")
    val sb = new StringBuilder
    sb.append('P').append(magic).append('\n')
    if (comment.nonEmpty) sb.append('#').append(comment).append('\n')
    sb.append(w).append(' ').append(h)
    if (comment.nonEmpty)
      sb.append('\n').append("# ").append(comment).append('\n')
    else sb.append('\t')
    sb.append(maxval).append('\n') // the single pre-raster whitespace
    val head = sb.toString.getBytes("US-ASCII")
    val wide = maxval > 255
    val data = new Array[Byte](samples.length * (if (wide) 2 else 1))
    var i = 0
    while (i < samples.length) {
      if (wide) {
        data(2 * i) = ((samples(i) >> 8) & 0xFF).toByte
        data(2 * i + 1) = (samples(i) & 0xFF).toByte
      } else data(i) = (samples(i) & 0xFF).toByte
      i += 1
    }
    head ++ data
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' ||
      b == 0x0B || b == '\f'

  /** Token reader: skip whitespace runs and `#` comments, then read
    * one unsigned decimal. Returns (value, next offset) or None.
    */
  private def readInt(b: Array[Byte], off0: Int): Option[(Int, Int)] = {
    var off = off0
    var skipping = true
    while (skipping && off < b.length) {
      if (isSpace(b(off))) off += 1
      else if (b(off) == '#') {
        while (off < b.length && b(off) != '\n') off += 1
      } else skipping = false
    }
    if (off >= b.length || b(off) < '0' || b(off) > '9') return None
    var v = 0L
    val start = off
    while (off < b.length && b(off) >= '0' && b(off) <= '9') {
      v = v * 10 + (b(off) - '0')
      if (v > Int.MaxValue) return None
      off += 1
    }
    if (off == start) None else Some((v.toInt, off))
  }

  /** Strict decode; None on any malformed header, bad dims, or a
    * raster shorter than the header promises (trailing junk after a
    * complete raster is tolerated, matching netpbm tools).
    */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 2 || bytes(0) != 'P') return None
    val magic = bytes(1) - '0'
    if (magic != 5 && magic != 6) return None
    for {
      (w, o1) <- readInt(bytes, 2)
      (h, o2) <- readInt(bytes, o1)
      (mv, o3) <- readInt(bytes, o2)
      ch = if (magic == 6) 3 else 1
      if w > 0 && h > 0 && mv >= 1 && mv <= 65535
      if w.toLong * h * ch <= MaxSamples
      // exactly one whitespace byte, then raster
      if o3 < bytes.length && isSpace(bytes(o3))
      n = w * h * ch
      wide = mv > 255
      if bytes.length - (o3 + 1) >= n * (if (wide) 2 else 1)
      samples = {
        val out = new Array[Int](n)
        val base = o3 + 1
        var i = 0
        var bad = false
        while (i < n && !bad) {
          val v =
            if (wide)
              ((bytes(base + 2 * i) & 0xFF) << 8) |
                (bytes(base + 2 * i + 1) & 0xFF)
            else bytes(base + i) & 0xFF
          if (v > mv) bad = true else out(i) = v
          i += 1
        }
        if (bad) null else out
      }
      if samples != null
    } yield Decoded(magic, w, h, mv, samples)
  }
}
