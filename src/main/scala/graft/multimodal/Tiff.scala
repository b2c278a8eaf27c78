package graft.multimodal

/** Pure-JVM baseline TIFF codec: uncompressed gray-8 / RGB-8 images
  * stored as STRIPS — the sixth real codec in the family (PNG, JPEG,
  * GIF, BMP, netpbm) and the pixel-carrying sibling of [[Exif]]'s
  * metadata-only IFD walk. The wrinkles exercised are real TIFF 6.0:
  * both byte orders end-to-end (header-declared, applying to every
  * integer INCLUDING the out-of-line arrays), multi-strip layout
  * (StripOffsets/StripByteCounts are COUNT-nStrips arrays — inline
  * when one strip's 4 bytes fit, offset-indirected otherwise; the
  * array-valued entry shape Exif's scalar walk never hits),
  * BitsPerSample as a count-SamplesPerPixel SHORT array, and a final
  * strip shorter than RowsPerStrip.
  *
  * Both directions are total: [[parse]] returns None on anything
  * malformed (CodecFuzzSpec). Decoded samples are returned RAW —
  * photometric interpretation (0 WhiteIsZero / 1 BlackIsZero / 2
  * RGB) is REPORTED, not applied, so the digest binds the file's
  * actual bytes.
  *
  * Format reference: the public TIFF 6.0 specification; the
  * reference repo has no image handling.
  */
object Tiff {

  final case class Decoded(width: Int, height: Int,
      samplesPerPixel: Int, photometric: Int, nStrips: Int,
      pixels: Array[Byte])

  private val TagWidth = 256
  private val TagHeight = 257
  private val TagBits = 258
  private val TagCompression = 259
  private val TagPhotometric = 262
  private val TagStripOffsets = 273
  private val TagSamplesPerPixel = 277
  private val TagRowsPerStrip = 278
  private val TagStripByteCounts = 279

  private val TypeShort = 3
  private val TypeLong = 4

  /** Encode `pixels` (row-major, `spp` samples per pixel, 8-bit) as
    * an uncompressed strip TIFF.
    *
    * @param photometric 0/1 for spp=1, 2 for spp=3
    * @param rowsPerStrip strip height; the last strip may be shorter
    */
  def encode(width: Int, height: Int, spp: Int, photometric: Int,
      pixels: Array[Byte], little: Boolean,
      rowsPerStrip: Int): Array[Byte] = {
    require(width > 0 && height > 0, "positive dims")
    require(spp == 1 || spp == 3, "gray-8 or RGB-8 only")
    require(if (spp == 3) photometric == 2
      else photometric == 0 || photometric == 1, "photometric/spp mismatch")
    require(pixels.length == width * height * spp, "pixel buffer size")
    require(rowsPerStrip >= 1, "rowsPerStrip >= 1")

    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    val rowBytes = width * spp
    val stripLens = Array.tabulate(nStrips) { s =>
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
      rows * rowBytes
    }
    val nEntries = 9
    val ifdStart = 8
    val ifdEnd = ifdStart + 2 + nEntries * 12 + 4
    // Out-of-line areas, in order: bits array (spp=3 only), strip
    // offsets array (nStrips > 1), strip byte counts array
    // (nStrips > 1), then the strip data.
    var p = ifdEnd
    val bitsOff = p
    if (spp == 3) p += spp * 2
    val offsOff = p
    if (nStrips > 1) p += nStrips * 4
    val cntsOff = p
    if (nStrips > 1) p += nStrips * 4
    val dataOff = p
    val total = dataOff + pixels.length
    val out = new Array[Byte](total)

    def put16(off: Int, v: Int): Unit =
      if (little) { out(off) = (v & 0xFF).toByte
        out(off + 1) = ((v >> 8) & 0xFF).toByte }
      else { out(off) = ((v >> 8) & 0xFF).toByte
        out(off + 1) = (v & 0xFF).toByte }
    def put32(off: Int, v: Long): Unit =
      if (little) { var i = 0; while (i < 4) {
        out(off + i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 } }
      else { var i = 0; while (i < 4) {
        out(off + 3 - i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 } }

    val bo = if (little) "II" else "MM"
    out(0) = bo(0).toByte; out(1) = bo(1).toByte
    put16(2, 42)
    put32(4, ifdStart.toLong)
    put16(ifdStart, nEntries)
    var e = ifdStart + 2
    def entry(tag: Int, typ: Int, cnt: Long)(value: Int => Unit): Unit = {
      put16(e, tag); put16(e + 2, typ); put32(e + 4, cnt)
      value(e + 8)
      e += 12
    }
    entry(TagWidth, TypeLong, 1L)(off => put32(off, width.toLong))
    entry(TagHeight, TypeLong, 1L)(off => put32(off, height.toLong))
    entry(TagBits, TypeShort, spp.toLong) { off =>
      if (spp == 1) put16(off, 8)
      else {
        put32(off, bitsOff.toLong)
        for (i <- 0 until spp) put16(bitsOff + 2 * i, 8)
      }
    }
    entry(TagCompression, TypeShort, 1L)(off => put16(off, 1))
    entry(TagPhotometric, TypeShort, 1L)(off => put16(off, photometric))
    entry(TagStripOffsets, TypeLong, nStrips.toLong) { off =>
      if (nStrips == 1) put32(off, dataOff.toLong)
      else {
        put32(off, offsOff.toLong)
        var so = dataOff
        for (s <- 0 until nStrips) {
          put32(offsOff + 4 * s, so.toLong); so += stripLens(s)
        }
      }
    }
    entry(TagSamplesPerPixel, TypeShort, 1L)(off => put16(off, spp))
    entry(TagRowsPerStrip, TypeLong, 1L)(off =>
      put32(off, rowsPerStrip.toLong))
    entry(TagStripByteCounts, TypeLong, nStrips.toLong) { off =>
      if (nStrips == 1) put32(off, stripLens(0).toLong)
      else {
        put32(off, cntsOff.toLong)
        for (s <- 0 until nStrips)
          put32(cntsOff + 4 * s, stripLens(s).toLong)
      }
    }
    put32(e, 0L) // no next IFD
    System.arraycopy(pixels, 0, out, dataOff, pixels.length)
    out
  }

  /** Parse + decode an uncompressed strip TIFF. None on anything
    * malformed: bad magic/order, unknown compression, bits ≠ 8,
    * spp ∉ {1,3}, photometric inconsistent with spp, counts/offsets
    * out of bounds, strips not covering exactly height rows, or any
    * array running past the file.
    */
  def parse(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 8) return None
    val order = new String(b, 0, 2, "US-ASCII")
    val little = order == "II"
    if (!little && order != "MM") return None
    def u16(off: Long): Int = {
      if (off < 0 || off + 2 > b.length) return -1
      val o = off.toInt
      if (little) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    }
    def u32(off: Long): Long = {
      if (off < 0 || off + 4 > b.length) return -1L
      var v = 0L
      var i = 0
      while (i < 4) {
        val byte = b(off.toInt + (if (little) i else 3 - i)) & 0xFF
        v |= byte.toLong << (8 * i)
        i += 1
      }
      v
    }
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8) return None
    val n = u16(ifd)
    if (n <= 0) return None
    if (ifd + 2 + n * 12L + 4 > b.length) return None

    var width = -1L
    var height = -1L
    var comp = 1
    var photo = -1
    var spp = 1
    var rps = Long.MaxValue
    var bitsOk = true
    var offs: Array[Long] = null
    var cnts: Array[Long] = null

    // SHORT or LONG scalar read at an entry's value slot.
    def scalar(off: Long, typ: Int): Long =
      if (typ == TypeShort) u16(off).toLong
      else if (typ == TypeLong) u32(off)
      else -1L
    // Count-`cnt` array of SHORT/LONG: inline when it fits 4 bytes.
    def arr(off: Long, typ: Int, cnt: Long): Array[Long] = {
      val sz = if (typ == TypeShort) 2 else if (typ == TypeLong) 4 else -1
      if (sz < 0 || cnt < 1 || cnt > 65535) return null
      val at = if (cnt * sz <= 4) off else u32(off)
      if (at < 0 || at + cnt * sz > b.length) return null
      Array.tabulate(cnt.toInt) { i =>
        if (sz == 2) u16(at + 2L * i).toLong else u32(at + 4L * i)
      }
    }

    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12L
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      tag match {
        case TagWidth if cnt == 1 => width = scalar(e + 8, typ)
        case TagHeight if cnt == 1 => height = scalar(e + 8, typ)
        case TagBits =>
          val a = arr(e + 8, typ, cnt)
          if (a == null || a.exists(_ != 8L)) bitsOk = false
        case TagCompression if cnt == 1 =>
          comp = scalar(e + 8, typ).toInt
        case TagPhotometric if cnt == 1 =>
          photo = scalar(e + 8, typ).toInt
        case TagStripOffsets => offs = arr(e + 8, typ, cnt)
        case TagSamplesPerPixel if cnt == 1 =>
          spp = scalar(e + 8, typ).toInt
        case TagRowsPerStrip if cnt == 1 => rps = scalar(e + 8, typ)
        case TagStripByteCounts => cnts = arr(e + 8, typ, cnt)
        case _ => // unknown tag: skip
      }
      i += 1
    }
    // Hostile-header allocation guard: reject before the pixel
    // buffer is sized (the PNG 2^30-dims lesson in CodecFuzzSpec).
    // Bound each u32 dimension BEFORE multiplying: width/height come
    // off the wire as values up to 2^32-1, so the Long product can
    // wrap negative and slip past a product-only check.
    if (width <= 0 || height <= 0 ||
        width > (1 << 24) || height > (1 << 24) ||
        width * height > (1 << 24))
      return None
    if (comp != 1 || !bitsOk) return None
    if (spp != 1 && spp != 3) return None
    if (spp == 3 && photo != 2) return None
    if (spp == 1 && photo != 0 && photo != 1) return None
    if (offs == null || cnts == null || offs.length != cnts.length)
      return None
    if (rps < 1) return None

    val rowBytes = width * spp
    val expect = width * height * spp
    if (cnts.map(c => if (c < 0) return None else c).sum != expect)
      return None
    val pixels = new Array[Byte](expect.toInt)
    var at = 0L
    var s = 0
    while (s < offs.length) {
      val o = offs(s)
      val c = cnts(s)
      if (o < 0 || c < 0 || o + c > b.length) return None
      if (c % rowBytes != 0) return None
      // every strip but the last must hold exactly rowsPerStrip rows
      if (s < offs.length - 1 && c != rps * rowBytes) return None
      System.arraycopy(b, o.toInt, pixels, at.toInt, c.toInt)
      at += c
      s += 1
    }
    if (at != expect) return None
    Some(Decoded(width.toInt, height.toInt, spp, photo, offs.length,
      pixels))
  }
}
