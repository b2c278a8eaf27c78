package graft.multimodal

import java.io.ByteArrayOutputStream

/** ICO container codec (the classic Windows icon directory; public
  * format: ICONDIR + ICONDIRENTRY[] + per-icon image data, where an
  * image is either a PNG stream (the Vista+ compressed form) or a
  * "DIB icon" — a BITMAPINFOHEADER with DOUBLED height covering a
  * bottom-up 24-bit XOR pixel block followed by a 1-bpp AND
  * transparency mask, both row-padded to 32 bits).
  *
  * The interesting decode hazards this walks: the doubled biHeight
  * convention (header height covers XOR + AND), the independent
  * 3-byte vs 1-bit row strides, MSB-first mask bit order, the 0-means-
  * 256 width/height bytes in the directory, and offset/size directory
  * entries that must be bounds-checked against the container (a
  * crafted directory can point anywhere). PNG entries re-enter the
  * real [[Png]] decoder.
  *
  * Parsing is total: any malformed container (bad magic, truncated
  * directory, out-of-range entry, undecodable PNG, non-24-bit or
  * compressed DIB, oversized dims) yields None / a dropped entry,
  * never a throw.
  */
object Ico {

  /** Decode bound shared with the other codecs. */
  private val MaxPixels = 1 << 20

  sealed trait Entry
  /** A complete PNG stream planted as a compressed icon. */
  final case class PngEntry(png: Array[Byte]) extends Entry
  /** Classic DIB icon: top-down RGB pixels + AND mask (true = set). */
  final case class DibEntry(width: Int, height: Int, rgb: Array[Byte],
      mask: Array[Boolean]) extends Entry

  private def putU16(b: ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
  }
  private def putU32(b: ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
    b.write((v >> 16) & 0xFF); b.write((v >> 24) & 0xFF)
  }

  private def dibBytes(e: DibEntry): Array[Byte] = {
    val w = e.width; val h = e.height
    val xorStride = ((w * 3 + 3) / 4) * 4
    val andStride = ((w + 31) / 32) * 4
    val out = new ByteArrayOutputStream()
    // BITMAPINFOHEADER with the doubled-height convention.
    putU32(out, 40); putU32(out, w); putU32(out, 2 * h)
    putU16(out, 1); putU16(out, 24); putU32(out, 0)
    putU32(out, xorStride * h + andStride * h)
    putU32(out, 0); putU32(out, 0); putU32(out, 0); putU32(out, 0)
    // XOR block: bottom-up BGR rows, padded.
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        out.write(e.rgb(i + 2) & 0xFF) // B
        out.write(e.rgb(i + 1) & 0xFF) // G
        out.write(e.rgb(i) & 0xFF)     // R
        x += 1
      }
      var pad = xorStride - w * 3
      while (pad > 0) { out.write(0); pad -= 1 }
      y -= 1
    }
    // AND mask: bottom-up 1-bpp MSB-first rows, padded to 32 bits.
    y = h - 1
    while (y >= 0) {
      val row = new Array[Byte](andStride)
      var x = 0
      while (x < w) {
        if (e.mask(y * w + x)) {
          row(x / 8) = (row(x / 8) | (0x80 >> (x % 8))).toByte
        }
        x += 1
      }
      out.write(row)
      y -= 1
    }
    out.toByteArray
  }

  /** Build a well-formed ICO container from the entries.
    *
    * Encoder contract (fixture/round-trip use — the decode side is
    * the production path): every [[DibEntry]] must carry exactly
    * w·h·3 rgb bytes and w·h mask flags with dims in [1, 256] (the
    * directory's 0-means-256 byte can express nothing larger), and
    * a [[PngEntry]] must hold a decodable PNG (its dims fill the
    * directory). Violations throw here, at build time — a silently
    * truncated pixel block or a 300-wide entry advertised as 256
    * would otherwise surface as a confusing decode-side mismatch.
    */
  def encode(entries: Seq[Entry]): Array[Byte] = {
    // One pass validates AND extracts directory dims (each PNG entry
    // decodes exactly once).
    val dims = entries.map {
      case p: PngEntry =>
        val dec = Png.decode(p.png).getOrElse(
          throw new IllegalArgumentException(
            "PngEntry must hold a decodable PNG"))
        require(dec.width >= 1 && dec.width <= 256 &&
          dec.height >= 1 && dec.height <= 256,
          s"PngEntry dims must be in [1, 256], got " +
            s"${dec.width}x${dec.height}")
        (dec.width, dec.height, 0)
      case d: DibEntry =>
        require(d.width >= 1 && d.width <= 256 &&
          d.height >= 1 && d.height <= 256,
          s"DibEntry dims must be in [1, 256], got " +
            s"${d.width}x${d.height}")
        require(d.rgb.length == d.width * d.height * 3,
          s"DibEntry rgb must be w*h*3 = ${d.width * d.height * 3} " +
            s"bytes, got ${d.rgb.length}")
        require(d.mask.length == d.width * d.height,
          s"DibEntry mask must be w*h = ${d.width * d.height} " +
            s"flags, got ${d.mask.length}")
        (d.width, d.height, 24)
    }
    val images = entries.map {
      case p: PngEntry => p.png
      case d: DibEntry => dibBytes(d)
    }
    // The directory count is a u16 — more entries would silently
    // wrap it, the exact decode-side mismatch the per-entry checks
    // above exist to prevent.
    require(entries.size <= 0xFFFF,
      s"ICO directory holds at most 65535 entries, got ${entries.size}")
    val out = new ByteArrayOutputStream()
    putU16(out, 0); putU16(out, 1); putU16(out, entries.size)
    var offset = 6 + 16 * entries.size
    entries.indices.foreach { i =>
      val (w, h, bits) = dims(i)
      out.write(if (w >= 256) 0 else w)
      out.write(if (h >= 256) 0 else h)
      out.write(0); out.write(0) // colorCount, reserved
      putU16(out, 1)             // planes
      putU16(out, bits)          // 0 for PNG entries, 24 for DIB
      putU32(out, images(i).length)
      putU32(out, offset)
      offset += images(i).length
    }
    images.foreach(out.write)
    out.toByteArray
  }

  /** Per-icon decode stats: dimensions, entry form, decoded pixel
    * sum, and (DIB only) the count of set AND-mask bits.
    */
  final case class IconMeta(idx: Int, width: Int, height: Int,
      isPng: Boolean, bitCount: Int, sumRgb: Long, maskBits: Long)

  def parse(p: Array[Byte]): Option[Seq[IconMeta]] =
    try parseImpl(p)
    catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def u16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8)
  private def u32(p: Array[Byte], o: Int): Long =
    (p(o) & 0xFF).toLong | ((p(o + 1) & 0xFF).toLong << 8) |
      ((p(o + 2) & 0xFF).toLong << 16) | ((p(o + 3) & 0xFF).toLong << 24)

  private val PngSig =
    Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  private def parseImpl(p: Array[Byte]): Option[Seq[IconMeta]] = {
    if (p.length < 6) return None
    if (u16(p, 0) != 0 || u16(p, 2) != 1) return None
    val count = u16(p, 4)
    if (p.length < 6 + 16 * count) return None
    val metas = (0 until count).flatMap { i =>
      val d = 6 + 16 * i
      val dirBits = u16(p, d + 6)
      val size = u32(p, d + 8)
      val off = u32(p, d + 12)
      if (off < 0 || size < 8 || off + size > p.length) None
      else parseImage(p, off.toInt, size.toInt, i, dirBits)
    }
    Some(metas)
  }

  private def parseImage(p: Array[Byte], off: Int, size: Int, idx: Int,
      dirBits: Int): Option[IconMeta] = {
    val isPng = (0 until 8).forall(j => (p(off + j) & 0xFF) == PngSig(j))
    if (isPng) {
      Png.decode(java.util.Arrays.copyOfRange(p, off, off + size)).map {
        dec =>
          var sum = 0L
          var i = 0
          while (i < dec.rgb.length) { sum += dec.rgb(i) & 0xFF; i += 1 }
          IconMeta(idx, dec.width, dec.height, isPng = true, dirBits,
            sum, 0L)
      }
    } else {
      if (size < 40 || u32(p, off) != 40L) return None
      val w = u32(p, off + 4).toInt
      val h2 = u32(p, off + 8).toInt
      val bits = u16(p, off + 14)
      val comp = u32(p, off + 16)
      if (h2 <= 0 || h2 % 2 != 0) return None
      val h = h2 / 2
      if (w <= 0 || bits != 24 || comp != 0L) return None
      if (w.toLong * h > MaxPixels) return None
      val xorStride = ((w * 3 + 3) / 4) * 4
      val andStride = ((w + 31) / 32) * 4
      if (off + 40 + xorStride.toLong * h + andStride.toLong * h
          > off + size) return None
      var sum = 0L
      var y = 0
      while (y < h) {
        // Bottom-up storage: file row y is image row h-1-y; the sum
        // is order-free but the bounds walk must use the real stride.
        val rowOff = off + 40 + y * xorStride
        var x = 0
        while (x < w) {
          sum += (p(rowOff + x * 3) & 0xFF) +
            (p(rowOff + x * 3 + 1) & 0xFF) + (p(rowOff + x * 3 + 2) & 0xFF)
          x += 1
        }
        y += 1
      }
      var maskBits = 0L
      val maskOff = off + 40 + xorStride * h
      y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val b = p(maskOff + y * andStride + x / 8) & 0xFF
          if ((b & (0x80 >> (x % 8))) != 0) maskBits += 1
          x += 1
        }
        y += 1
      }
      Some(IconMeta(idx, w, h, isPng = false, bits, sum, maskBits))
    }
  }
}
