package graft.multimodal

/** Pure-JVM BMP (Windows DIB) codec — the uncompressed-raster end of
  * the image family (PNG = zlib/filters, JPEG = lossy DCT, GIF = LZW;
  * BMP exercises the layout wrinkles the others don't have):
  * little-endian headers, BGR byte order, 4-byte scanline padding,
  * BOTTOM-UP row storage (positive biHeight) vs top-down (negative),
  * and the BI_RLE8 run-length compression with its escape codes
  * (end-of-line, end-of-bitmap, delta skip, absolute mode with word
  * alignment). Encoder + decoder are both here so the planted corpus
  * is REAL format bytes, decoded by a REAL header/RLE walk.
  *
  * Format reference: the public BITMAPFILEHEADER/BITMAPINFOHEADER
  * layout (Windows GDI documentation); no reference-repo code is
  * involved (the reference has no image handling).
  */
object Bmp {

  final case class Decoded(width: Int, height: Int, rgb: Array[Byte],
      compression: Int)

  private val FileHeaderSize = 14
  private val InfoHeaderSize = 40
  /** Decode bound: reject dims whose pixel count could OOM a task. */
  private val MaxPixels = 1 << 20

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte
    b(off + 3) = ((v >> 24) & 0xFF).toByte
  }
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def headers(w: Int, h: Int, bitCount: Int, compression: Int,
      paletteEntries: Int, imageSize: Int): Array[Byte] = {
    val palBytes = paletteEntries * 4
    val off = FileHeaderSize + InfoHeaderSize + palBytes
    val b = new Array[Byte](off)
    b(0) = 'B'; b(1) = 'M'
    putU32(b, 2, off + imageSize) // bfSize
    putU32(b, 10, off)            // bfOffBits
    putU32(b, 14, InfoHeaderSize)
    putU32(b, 18, w)
    putU32(b, 22, h) // caller passes negative h for top-down
    putU16(b, 26, 1) // biPlanes
    putU16(b, 28, bitCount)
    putU32(b, 30, compression)
    putU32(b, 34, imageSize)
    b
  }

  /** 24-bit BI_RGB: BGR samples, rows padded to 4 bytes, stored
    * bottom-up unless `topDown` (negative biHeight).
    *
    * @param rgb top-down RGB, 3 bytes/pixel
    */
  def encode24(w: Int, h: Int, rgb: Array[Byte],
      topDown: Boolean): Array[Byte] = {
    require(rgb.length == w * h * 3, "rgb must be w*h*3 bytes")
    val rowSize = (w * 3 + 3) & ~3
    val data = new Array[Byte](rowSize * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val s = (srcRow * w + x) * 3
        val dst = y * rowSize + x * 3
        data(dst) = rgb(s + 2)     // B
        data(dst + 1) = rgb(s + 1) // G
        data(dst + 2) = rgb(s)     // R
        x += 1
      }
      y += 1
    }
    headers(w, if (topDown) -h else h, 24, 0, 0, data.length) ++ data
  }

  /** 8-bit BI_RLE8: palette-indexed with run-length compression.
    * Rows are stored bottom-up (the only legal order for RLE BMPs).
    * To exercise BOTH RLE modes, even storage rows emit encoded
    * (count, index) runs and odd rows emit one absolute-mode block
    * (0x00, n, indices, word-pad); every row ends with the 0x00 0x00
    * end-of-line escape and the stream with 0x00 0x01 end-of-bitmap.
    *
    * @param palette psize*3 RGB bytes
    * @param indices top-down w*h palette indices
    */
  def encodeRle8(w: Int, h: Int, palette: Array[Byte],
      indices: Array[Int]): Array[Byte] = {
    require(palette.length % 3 == 0, "palette must be RGB triples")
    require(indices.length == w * h, "indices must be w*h")
    val psize = palette.length / 3
    require(indices.forall(i => i >= 0 && i < psize),
      "index out of palette range")
    require(w >= 3 && w <= 255,
      "absolute-mode rows need 3 <= w <= 255")
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    var sy = 0
    while (sy < h) { // storage order: bottom-up
      val y = h - 1 - sy
      if (sy % 2 == 0) {
        // encoded runs of equal consecutive indices
        var x = 0
        while (x < w) {
          val v = indices(y * w + x)
          var n = 1
          while (x + n < w && n < 255 && indices(y * w + x + n) == v)
            n += 1
          out += n.toByte
          out += v.toByte
          x += n
        }
      } else {
        // one absolute-mode block for the whole row, word-aligned
        out += 0.toByte
        out += w.toByte
        var x = 0
        while (x < w) { out += indices(y * w + x).toByte; x += 1 }
        if (w % 2 == 1) out += 0.toByte
      }
      out += 0.toByte; out += 0.toByte // end of line
      sy += 1
    }
    out += 0.toByte; out += 1.toByte // end of bitmap
    val data = out.toArray
    val head = headers(w, h, 8, 1, psize, data.length)
    // palette as BGRA quads at offset 54
    var j = 0
    while (j < psize) {
      head(FileHeaderSize + InfoHeaderSize + j * 4) = palette(j * 3 + 2)
      head(FileHeaderSize + InfoHeaderSize + j * 4 + 1) =
        palette(j * 3 + 1)
      head(FileHeaderSize + InfoHeaderSize + j * 4 + 2) = palette(j * 3)
      j += 1
    }
    head ++ data
  }

  /** Total decode: 24-bit BI_RGB (either row order) and 8-bit BI_RGB
    * / BI_RLE8 (incl. delta skips, which fill with palette entry 0).
    * Returns top-down RGB; None on anything malformed.
    */
  def decode(p: Array[Byte]): Option[Decoded] = {
    try {
      if (p.length < FileHeaderSize + InfoHeaderSize) return None
      if (p(0) != 'B' || p(1) != 'M') return None
      val offBits = u32(p, 10)
      // BITMAPINFOHEADER and its V4/V5 extensions (biSize 40/108/124)
      // share the first 40 bytes; the palette starts AFTER the full
      // declared header, so V4/V5 color-space fields never read as
      // palette entries.
      val infoSize = u32(p, 14)
      if (infoSize < InfoHeaderSize || infoSize > 1024) return None
      val palBase = FileHeaderSize + infoSize
      val w = u32(p, 18)
      val rawH = u32(p, 22)
      val topDown = rawH < 0
      val h = math.abs(rawH)
      val bits = u16(p, 28)
      val comp = u32(p, 30)
      if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
      if (offBits < palBase || offBits > p.length) return None
      val rgb = new Array[Byte](w * h * 3)

      def paletteAt(j: Int, c: Int): Byte =
        // stored BGRA; c is the RGB channel
        p(palBase + j * 4 + (2 - c))

      (bits, comp) match {
        case (24, 0) =>
          val rowSize = (w * 3 + 3) & ~3
          if (offBits + rowSize.toLong * h > p.length) return None
          var y = 0
          while (y < h) {
            val srcRow = if (topDown) y else h - 1 - y
            var x = 0
            while (x < w) {
              val s = offBits + srcRow * rowSize + x * 3
              val dpx = (y * w + x) * 3
              rgb(dpx) = p(s + 2)
              rgb(dpx + 1) = p(s + 1)
              rgb(dpx + 2) = p(s)
              x += 1
            }
            y += 1
          }
          Some(Decoded(w, h, rgb, comp))
        case (8, 0) =>
          if (topDown) return None
          val rowSize = (w + 3) & ~3
          if (offBits + rowSize.toLong * h > p.length) return None
          val psize = (offBits - palBase) / 4
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val j = p(offBits + (h - 1 - y) * rowSize + x) & 0xFF
              if (j >= psize) return None
              val dpx = (y * w + x) * 3
              var c = 0
              while (c < 3) { rgb(dpx + c) = paletteAt(j, c); c += 1 }
              x += 1
            }
            y += 1
          }
          Some(Decoded(w, h, rgb, comp))
        case (8, 1) =>
          if (topDown) return None // RLE is defined bottom-up only
          val psize = (offBits - palBase) / 4
          if (psize <= 0) return None
          // decode into a bottom-up index grid, palette 0 background
          val idx = new Array[Int](w * h)
          var pos = offBits
          var row = 0 // storage row (0 = bottom)
          var x = 0
          var done = false
          while (!done) {
            if (pos + 1 >= p.length) return None
            val n = p(pos) & 0xFF
            val v = p(pos + 1) & 0xFF
            pos += 2
            if (n > 0) { // encoded run
              if (v >= psize || row >= h || x + n > w) return None
              var i = 0
              while (i < n) { idx(row * w + x + i) = v; i += 1 }
              x += n
            } else v match {
              case 0 => row += 1; x = 0 // end of line
              case 1 => done = true     // end of bitmap
              case 2 =>                 // delta: skip right/up
                if (pos + 1 >= p.length) return None
                x += p(pos) & 0xFF
                row += p(pos + 1) & 0xFF
                pos += 2
                if (x > w || row > h) return None
              case cnt =>               // absolute mode
                if (row >= h || x + cnt > w) return None
                if (pos + cnt > p.length) return None
                var i = 0
                while (i < cnt) {
                  val j = p(pos + i) & 0xFF
                  if (j >= psize) return None
                  idx(row * w + x + i) = j
                  i += 1
                }
                pos += cnt + (cnt % 2) // word-aligned
                x += cnt
            }
          }
          var y = 0
          while (y < h) {
            var xx = 0
            while (xx < w) {
              val j = idx((h - 1 - y) * w + xx)
              val dpx = (y * w + xx) * 3
              var c = 0
              while (c < 3) { rgb(dpx + c) = paletteAt(j, c); c += 1 }
              xx += 1
            }
            y += 1
          }
          Some(Decoded(w, h, rgb, comp))
        case _ => None
      }
    } catch { case _: IndexOutOfBoundsException => None }
  }
}
