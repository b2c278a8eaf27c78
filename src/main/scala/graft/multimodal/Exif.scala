package graft.multimodal

/** Pure-JVM EXIF metadata codec: an APP1 segment carrying a TIFF
  * byte stream (the metadata side of the JPEG family — [[Jpeg]]
  * decodes pixels, this walks the marker stream for the APP1 and
  * then the TIFF IFD inside it). The parsing wrinkles are real
  * TIFF: BOTH byte orders ("II" little / "MM" big endian declared
  * in the header and applying to every integer after it), 12-byte
  * IFD entries whose value field holds the value INLINE when it
  * fits in 4 bytes and a FILE OFFSET otherwise (exercised here by
  * short vs long ASCII values), and type-tagged fields (SHORT /
  * LONG / ASCII). Encoder + decoder both live here so planted
  * corpora are real format bytes walked by a real IFD machine.
  *
  * Format reference: the public TIFF 6.0 and EXIF 2.3
  * specifications; the reference repo has no image handling.
  */
object Exif {

  final case class Meta(byteOrder: String, orientation: Int,
      width: Long, height: Long, dateTime: String, make: String)

  private val TagWidth = 0x0100
  private val TagHeight = 0x0101
  private val TagMake = 0x010F
  private val TagOrientation = 0x0112
  private val TagDateTime = 0x0132

  private val TypeAscii = 2
  private val TypeShort = 3
  private val TypeLong = 4

  /** Build SOI + APP1(Exif/TIFF IFD0) and splice the rest of a real
    * JPEG stream after it (everything following `jpeg`'s SOI), so
    * the metadata walker must skip genuine segments to find EOI.
    */
  def encodeInto(jpeg: Array[Byte], meta: Meta): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF &&
      (jpeg(1) & 0xFF) == 0xD8, "not a JPEG stream")
    val app1 = encodeApp1(meta)
    Array[Byte](0xFF.toByte, 0xD8.toByte) ++ app1 ++ jpeg.drop(2)
  }

  /** The APP1 segment bytes (marker + length + Exif header + TIFF). */
  def encodeApp1(meta: Meta): Array[Byte] = {
    val little = meta.byteOrder == "II"
    require(little || meta.byteOrder == "MM", "byteOrder must be II|MM")
    val dt = meta.dateTime.getBytes("US-ASCII") :+ 0.toByte
    val mk = meta.make.getBytes("US-ASCII") :+ 0.toByte
    // TIFF layout: header(8) + count(2) + 5 entries(60) + next(4),
    // then the out-of-line values.
    val ifdEnd = 8 + 2 + 5 * 12 + 4
    val dtOff = ifdEnd
    val mkOff = ifdEnd + dt.length
    val tiff = new Array[Byte](mkOff + mk.length)
    def put16(off: Int, v: Int): Unit =
      if (little) { tiff(off) = (v & 0xFF).toByte
        tiff(off + 1) = ((v >> 8) & 0xFF).toByte }
      else { tiff(off) = ((v >> 8) & 0xFF).toByte
        tiff(off + 1) = (v & 0xFF).toByte }
    def put32(off: Int, v: Long): Unit =
      if (little) { var i = 0; while (i < 4) {
        tiff(off + i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 } }
      else { var i = 0; while (i < 4) {
        tiff(off + 3 - i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 } }
    tiff(0) = meta.byteOrder(0).toByte; tiff(1) = meta.byteOrder(1).toByte
    put16(2, 42)
    put32(4, 8L) // IFD0 right after the header
    put16(8, 5)  // entry count
    var e = 10
    def entry(tag: Int, typ: Int, cnt: Long)(value: Int => Unit): Unit = {
      put16(e, tag); put16(e + 2, typ); put32(e + 4, cnt)
      value(e + 8)
      e += 12
    }
    // Entries must be ascending by tag per TIFF 6.0.
    entry(TagWidth, TypeLong, 1L)(off => put32(off, meta.width))
    entry(TagHeight, TypeLong, 1L)(off => put32(off, meta.height))
    entry(TagMake, TypeAscii, mk.length.toLong) { off =>
      if (mk.length <= 4) System.arraycopy(mk, 0, tiff, off, mk.length)
      else put32(off, mkOff.toLong)
    }
    entry(TagOrientation, TypeShort, 1L)(off => put16(off, meta.orientation))
    entry(TagDateTime, TypeAscii, dt.length.toLong) { off =>
      if (dt.length <= 4) System.arraycopy(dt, 0, tiff, off, dt.length)
      else put32(off, dtOff.toLong)
    }
    put32(e, 0L) // no next IFD
    System.arraycopy(dt, 0, tiff, dtOff, dt.length)
    System.arraycopy(mk, 0, tiff, mkOff, mk.length)
    val body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = body.length + 2
    require(len <= 0xFFFF, "APP1 too long")
    Array[Byte](0xFF.toByte, 0xE1.toByte,
      ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ body
  }

  /** Walk the JPEG marker stream for an Exif APP1 and parse its
    * IFD0. None on anything malformed: bad markers, truncated
    * segments, unknown byte order, wrong TIFF magic, entries or
    * out-of-line values running past the segment.
    */
  def parse(bytes: Array[Byte]): Option[Meta] = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF ||
      (bytes(1) & 0xFF) != 0xD8) return None
    var p = 2
    while (p + 4 <= bytes.length) {
      if ((bytes(p) & 0xFF) != 0xFF) return None
      val marker = bytes(p + 1) & 0xFF
      if (marker == 0xD9 || marker == 0xDA) return None // EOI/SOS: none
      val len = ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF)
      if (len < 2 || p + 2 + len > bytes.length) return None
      if (marker == 0xE1 && len >= 8 + 6 &&
        bytes(p + 4) == 'E' && bytes(p + 5) == 'x' &&
        bytes(p + 6) == 'i' && bytes(p + 7) == 'f' &&
        bytes(p + 8) == 0 && bytes(p + 9) == 0)
        return parseTiff(bytes, p + 10, len - 8)
      p += 2 + len
    }
    None
  }

  private def parseTiff(b: Array[Byte], base: Int, size: Int)
      : Option[Meta] = {
    if (size < 8) return None
    val order = new String(b, base, 2, "US-ASCII")
    val little = order == "II"
    if (!little && order != "MM") return None
    def u16(off: Int): Int =
      if (little) (b(base + off) & 0xFF) | ((b(base + off + 1) & 0xFF) << 8)
      else ((b(base + off) & 0xFF) << 8) | (b(base + off + 1) & 0xFF)
    def u32(off: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 4) {
        val byte = b(base + off + (if (little) i else 3 - i)) & 0xFF
        v |= byte.toLong << (8 * i)
        i += 1
      }
      v
    }
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > size) return None
    val n = u16(ifd.toInt)
    val entriesEnd = ifd + 2 + n * 12L
    if (entriesEnd + 4 > size) return None
    var orientation = -1
    var width = -1L
    var height = -1L
    var dateTime: String = null
    var make: String = null
    def ascii(off: Int, cnt: Long): Option[String] = {
      if (cnt < 1 || cnt > 1024) return None
      val at = if (cnt <= 4) off else {
        val o = u32(off)
        if (o + cnt > size) return None
        o.toInt
      }
      if (at + cnt > size) return None
      var end = (cnt - 1).toInt // trailing NUL
      while (end > 0 && b(base + at + end - 1) == 0) end -= 1
      Some(new String(b, base + at, end, "US-ASCII"))
    }
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + i * 12
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      (tag, typ) match {
        case (TagOrientation, TypeShort) if cnt == 1 =>
          orientation = u16(e + 8)
        case (TagWidth, TypeLong) if cnt == 1 => width = u32(e + 8)
        case (TagWidth, TypeShort) if cnt == 1 => width = u16(e + 8).toLong
        case (TagHeight, TypeLong) if cnt == 1 => height = u32(e + 8)
        case (TagHeight, TypeShort) if cnt == 1 =>
          height = u16(e + 8).toLong
        case (TagDateTime, TypeAscii) =>
          ascii(e + 8, cnt) match {
            case Some(s) => dateTime = s
            case None => return None
          }
        case (TagMake, TypeAscii) =>
          ascii(e + 8, cnt) match {
            case Some(s) => make = s
            case None => return None
          }
        case _ => // unknown tag: skip
      }
      i += 1
    }
    if (orientation < 0 || width < 0 || height < 0 ||
      dateTime == null || make == null) None
    else Some(Meta(order, orientation, width, height, dateTime, make))
  }
}
