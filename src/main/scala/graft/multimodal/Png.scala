package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** A real (minimal) PNG codec — pure JVM, no image libraries.
  *
  * The ENCODER exists to plant test images; the DECODER is the
  * capability: it decodes any non-interlaced 8-bit RGB PNG — chunk
  * walk with CRC32 verification, multi-chunk IDAT reassembly, real
  * zlib inflation (`java.util.zip.Inflater`), and scanline
  * reconstruction for all five PNG filter types (None/Sub/Up/
  * Average/Paeth, per RFC 2083 §6). This replaces the byte-histogram
  * decode stand-in with actual pixel recovery for the PNG case.
  */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Standard Paeth predictor (RFC 2083): nearest of left/up/upleft
    * to p = left + up - upleft, ties left > up > upleft.
    */
  def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be4(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    be4(data.length.toLong)
    val tb = tpe.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    be4(crc.getValue)
    out.toByteArray
  }

  /** Encode an 8-bit RGB image. `filterOf(y)` picks each scanline's
    * filter type (0-4); the filtered bytes are deflated with the
    * real zlib Deflater.
    */
  def encode(width: Int, height: Int, rgb: Array[Byte],
      filterOf: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0, "IHDR dimensions must be positive")
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val bpp = 3
    val stride = width * bpp
    val filtered = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val f = filterOf(y)
      filtered(y * (stride + 1)) = f.toByte
      var i = 0
      while (i < stride) {
        val raw = rgb(y * stride + i) & 0xFF
        val left = if (i >= bpp) rgb(y * stride + i - bpp) & 0xFF else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) & 0xFF else 0
        val upLeft =
          if (y > 0 && i >= bpp) rgb((y - 1) * stride + i - bpp) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
          case other => throw new IllegalArgumentException(s"filter $other")
        }
        filtered(y * (stride + 1) + 1 + i) = ((raw - pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(filtered)
    deflater.finish()
    val buf = new Array[Byte](filtered.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zOut.write(buf, 0, n)
    }
    deflater.end()
    val ihdr = new Array[Byte](13)
    def put4(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >> 24) & 0xFF).toByte; ihdr(off + 1) = ((v >> 16) & 0xFF).toByte
      ihdr(off + 2) = ((v >> 8) & 0xFF).toByte; ihdr(off + 3) = (v & 0xFF).toByte
    }
    put4(0, width); put4(4, height)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, color type 2 (truecolor)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    // Split IDAT in two when possible so the decoder's multi-chunk
    // reassembly path is exercised by every planted image.
    val z = zOut.toByteArray
    if (z.length > 1) {
      out.write(chunk("IDAT", z.take(z.length / 2)))
      out.write(chunk("IDAT", z.drop(z.length / 2)))
    } else out.write(chunk("IDAT", z))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  case class Decoded(width: Int, height: Int, rgb: Array[Byte])

  /** Decode a non-interlaced 8-bit RGB PNG. Returns None for
    * anything malformed: bad signature, CRC mismatch, unsupported
    * IHDR, truncated chunks, or inconsistent pixel data length.
    */
  def decode(p: Array[Byte]): Option[Decoded] =
    try decodeImpl(p)
    catch {
      // totality is the contract: any residual crafted-input bounds
      // surprise is a clean rejection, never a task-killing throw
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def decodeImpl(p: Array[Byte]): Option[Decoded] = {
    if (p.length < Signature.length + 12) return None
    var i = 0
    while (i < Signature.length) {
      if (p(i) != Signature(i)) return None
      i += 1
    }
    def u(j: Int): Int = p(j) & 0xFF
    def be4(j: Int): Long =
      (u(j).toLong << 24) | (u(j + 1) << 16) | (u(j + 2) << 8) | u(j + 3)
    var off = Signature.length
    var width = -1; var height = -1
    var sawIhdr = false; var sawEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawEnd) {
      if (off + 12 > p.length) return None
      val len = be4(off)
      if (len > Int.MaxValue - 12 || off + 12 + len > p.length) return None
      val tpe = new String(p, off + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(p, off + 4, 4 + len.toInt)
      if (crc.getValue != be4(off + 8 + len.toInt)) return None
      tpe match {
        case "IHDR" =>
          if (len != 13) return None
          width = be4(off + 8).toInt
          height = be4(off + 12).toInt
          // supported subset: 8-bit truecolor, deflate, adaptive
          // filtering, non-interlaced
          if (u(off + 16) != 8 || u(off + 17) != 2 || u(off + 18) != 0 ||
            u(off + 19) != 0 || u(off + 20) != 0) return None
          sawIhdr = true
        case "IDAT" => idat.write(p, off + 8, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      off += 12 + len.toInt
    }
    if (!sawIhdr || width <= 0 || height <= 0) return None
    val bpp = 3
    // size arithmetic in Long: a crafted IHDR (e.g. 2^30 × 1) must be
    // rejected, not Int-overflow into a negative allocation; the raw
    // pixel data also can't exceed what a single byte array holds
    val expectL = (width.toLong * bpp + 1L) * height.toLong
    if (expectL > Int.MaxValue - 8) return None
    val stride = width * bpp
    val expect = expectL.toInt
    val filtered = new Array[Byte](expect)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < expect && !inflater.finished()) {
        val n = inflater.inflate(filtered, got, expect - got)
        if (n == 0 && inflater.needsInput()) return None // truncated
        // FDICT streams stall with needsInput()=false: inflate keeps
        // returning 0 waiting for a preset dictionary we never supply
        if (n == 0 && inflater.needsDictionary()) return None
        if (n == 0 && !inflater.needsInput() &&
          !inflater.finished()) return None // any other zero-progress stall
        got += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    if (got != expect) return None
    val rgb = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = filtered(y * (stride + 1)) & 0xFF
      var i2 = 0
      while (i2 < stride) {
        val x = filtered(y * (stride + 1) + 1 + i2) & 0xFF
        val left = if (i2 >= bpp) rgb(y * stride + i2 - bpp) & 0xFF else 0
        val up = if (y > 0) rgb((y - 1) * stride + i2) & 0xFF else 0
        val upLeft =
          if (y > 0 && i2 >= bpp) rgb((y - 1) * stride + i2 - bpp) & 0xFF
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
          case _ => return None
        }
        rgb(y * stride + i2) = ((x + pred) & 0xFF).toByte
        i2 += 1
      }
      y += 1
    }
    Some(Decoded(width, height, rgb))
  }
}
