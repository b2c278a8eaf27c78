package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** A real (minimal) PNG codec — pure JVM, no image libraries.
  *
  * The ENCODER exists to plant test images; the DECODER is the
  * capability, covering the color-type spread of a real web crawl:
  * truecolor (2), truecolor+alpha (6), grayscale (0), and
  * gray+alpha (4) at bit depths 8 and 16 (16-bit big-endian samples
  * downsample to their high byte), and palette (3) at bit depths
  * 1/2/4/8, each non-interlaced or Adam7-interlaced — chunk walk with CRC32
  * verification, multi-chunk IDAT reassembly, real zlib inflation
  * (`java.util.zip.Inflater`), per-pass scanline reconstruction for
  * all five PNG filter types (None/Sub/Up/Average/Paeth, RFC 2083
  * §6), sub-byte pixel unpacking, PLTE lookup, and Adam7 pass
  * scatter. Output is always 8-bit RGB (alpha dropped, gray
  * replicated, palette expanded).
  */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  // Adam7 pass grids (RFC 2083 §2.6): start and step per axis.
  private val A7xStart = Array(0, 4, 0, 2, 0, 1, 0)
  private val A7yStart = Array(0, 0, 4, 0, 2, 0, 1)
  private val A7xStep = Array(8, 8, 4, 4, 2, 2, 1)
  private val A7yStep = Array(8, 8, 8, 4, 4, 2, 2)

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

  /** Pass geometry: (width, height) of Adam7 pass `p` for an image of
    * w×h; non-interlaced is modeled as a single pass 7 with the full
    * frame (start 0, step 1).
    */
  private def passDims(w: Int, h: Int, p: Int): (Int, Int) = (
    (w - A7xStart(p) + A7xStep(p) - 1) / A7xStep(p),
    (h - A7yStart(p) + A7yStep(p) - 1) / A7yStep(p))

  /** Filter one pass's raw scanlines (`raw` = pw·ph pixels, bpp bytes
    * each... generalized to `rowBytes` packed bytes per row) into
    * filter-prefixed form, picking each line's filter via
    * `filterOf(globalRow)`.
    */
  private def filterPass(raw: Array[Byte], rowBytes: Int, rows: Int,
      fbpp: Int, filterOf: Int => Int, out: java.io.ByteArrayOutputStream)
      : Unit = {
    var y = 0
    while (y < rows) {
      val f = filterOf(y)
      require(f >= 0 && f <= 4, s"filter $f")
      out.write(f)
      var i = 0
      while (i < rowBytes) {
        val cur = raw(y * rowBytes + i) & 0xFF
        val left = if (i >= fbpp) raw(y * rowBytes + i - fbpp) & 0xFF else 0
        val up = if (y > 0) raw((y - 1) * rowBytes + i) & 0xFF else 0
        val upLeft =
          if (y > 0 && i >= fbpp) raw((y - 1) * rowBytes + i - fbpp) & 0xFF
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, upLeft)
        }
        out.write((cur - pred) & 0xFF)
        i += 1
      }
      y += 1
    }
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater()
    deflater.setInput(data)
    deflater.finish()
    val buf = new Array[Byte](data.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zOut.write(buf, 0, n)
    }
    deflater.end()
    zOut.toByteArray
  }

  private def assemble(width: Int, height: Int, depth: Int,
      colorType: Int, interlaced: Boolean, palette: Array[Byte],
      z: Array[Byte]): Array[Byte] = {
    val ihdr = new Array[Byte](13)
    def put4(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >> 24) & 0xFF).toByte
      ihdr(off + 1) = ((v >> 16) & 0xFF).toByte
      ihdr(off + 2) = ((v >> 8) & 0xFF).toByte
      ihdr(off + 3) = (v & 0xFF).toByte
    }
    put4(0, width); put4(4, height)
    ihdr(8) = depth.toByte; ihdr(9) = colorType.toByte
    ihdr(12) = if (interlaced) 1 else 0
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    if (palette != null) out.write(chunk("PLTE", palette))
    // Split IDAT in two when possible so the decoder's multi-chunk
    // reassembly path is exercised by every planted image.
    if (z.length > 1) {
      out.write(chunk("IDAT", z.take(z.length / 2)))
      out.write(chunk("IDAT", z.drop(z.length / 2)))
    } else out.write(chunk("IDAT", z))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Encode an 8-bit RGB image, non-interlaced. `filterOf(y)` picks
    * each scanline's filter type (0-4); the filtered bytes are
    * deflated with the real zlib Deflater.
    */
  def encode(width: Int, height: Int, rgb: Array[Byte],
      filterOf: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0, "IHDR dimensions must be positive")
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val out = new java.io.ByteArrayOutputStream()
    filterPass(rgb, width * 3, height, 3, filterOf, out)
    assemble(width, height, 8, 2, interlaced = false, null,
      deflate(out.toByteArray))
  }

  /** Encode an 8-bit RGB image with Adam7 interlacing: the seven
    * passes are extracted, filtered independently (each pass is its
    * own sub-image per RFC 2083 §8.2), and deflated as ONE zlib
    * stream.
    */
  def encodeInterlaced(width: Int, height: Int, rgb: Array[Byte],
      filterOf: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0, "IHDR dimensions must be positive")
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    while (p < 7) {
      val (pw, ph) = passDims(width, height, p)
      if (pw > 0 && ph > 0) {
        val raw = new Array[Byte](pw * ph * 3)
        var y = 0
        while (y < ph) {
          var x = 0
          while (x < pw) {
            val sy = A7yStart(p) + y * A7yStep(p)
            val sx = A7xStart(p) + x * A7xStep(p)
            System.arraycopy(rgb, (sy * width + sx) * 3, raw,
              (y * pw + x) * 3, 3)
            x += 1
          }
          y += 1
        }
        filterPass(raw, pw * 3, ph, 3, filterOf, out)
      }
      p += 1
    }
    assemble(width, height, 8, 2, interlaced = true, null,
      deflate(out.toByteArray))
  }

  /** Encode a PALETTE image at bit depth 1/2/4/8 (optionally Adam7-
    * interlaced): `palette` is 3·n RGB bytes, `indices` one palette
    * index per pixel (row-major), packed MSB-first at sub-byte
    * depths per RFC 2083 §2.3.
    */
  def encodePalette(width: Int, height: Int, depth: Int,
      palette: Array[Byte], indices: Array[Int], interlaced: Boolean,
      filterOf: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0, "IHDR dimensions must be positive")
    require(depth == 1 || depth == 2 || depth == 4 || depth == 8,
      "palette depth must be 1/2/4/8")
    require(palette.length % 3 == 0 && palette.length <= 3 * 256,
      "palette is 3*n RGB bytes")
    require(indices.length == width * height, "one index per pixel")
    val maxIdx = palette.length / 3
    require(indices.forall(i => i >= 0 && i < maxIdx && i < (1 << depth)),
      "indices must fit the palette and depth")
    def packPass(xs: Int, ys: Int, xstep: Int, ystep: Int, pw: Int,
        ph: Int, out: java.io.ByteArrayOutputStream): Unit = {
      val rowBytes = (pw * depth + 7) / 8
      val raw = new Array[Byte](rowBytes * ph)
      var y = 0
      while (y < ph) {
        var x = 0
        while (x < pw) {
          val idx = indices((ys + y * ystep) * width + (xs + x * xstep))
          val bitOff = x * depth
          val byteAt = y * rowBytes + bitOff / 8
          val shift = 8 - depth - (bitOff % 8)
          raw(byteAt) = (raw(byteAt) | (idx << shift)).toByte
          x += 1
        }
        y += 1
      }
      filterPass(raw, rowBytes, ph, 1, filterOf, out)
    }
    val out = new java.io.ByteArrayOutputStream()
    if (interlaced) {
      var p = 0
      while (p < 7) {
        val (pw, ph) = passDims(width, height, p)
        if (pw > 0 && ph > 0)
          packPass(A7xStart(p), A7yStart(p), A7xStep(p), A7yStep(p),
            pw, ph, out)
        p += 1
      }
    } else packPass(0, 0, 1, 1, width, height, out)
    assemble(width, height, depth, 3, interlaced, palette,
      deflate(out.toByteArray))
  }

  /** Encode an 8-bit image of arbitrary supported color type (0 gray,
    * 2 RGB, 4 gray+alpha, 6 RGBA), non-interlaced — primarily for
    * spec coverage of the alpha-dropping decode paths. `data` is
    * channels·w·h bytes, interleaved.
    */
  def encodeRaw8(width: Int, height: Int, colorType: Int,
      data: Array[Byte], filterOf: Int => Int): Array[Byte] = {
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case other => throw new IllegalArgumentException(s"color type $other")
    }
    require(width > 0 && height > 0, "IHDR dimensions must be positive")
    require(data.length == width * height * channels,
      "data must be w*h*channels bytes")
    val out = new java.io.ByteArrayOutputStream()
    filterPass(data, width * channels, height, channels, filterOf, out)
    assemble(width, height, 8, colorType, interlaced = false, null,
      deflate(out.toByteArray))
  }

  /** Encode a 16-BIT image (big-endian samples) of color type 0 gray,
    * 2 RGB, 4 gray+alpha, or 6 RGBA, non-interlaced — spec coverage
    * for the 16-bit decode path. `data` holds channels·w·h samples
    * as Ints in [0, 65535].
    */
  def encodeRaw16(width: Int, height: Int, colorType: Int,
      data: Array[Int], filterOf: Int => Int): Array[Byte] = {
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case other => throw new IllegalArgumentException(s"color type $other")
    }
    require(width > 0 && height > 0, "IHDR dimensions must be positive")
    require(data.length == width * height * channels,
      "data must be w*h*channels samples")
    val raw = new Array[Byte](data.length * 2)
    var i = 0
    while (i < data.length) {
      raw(i * 2) = ((data(i) >> 8) & 0xFF).toByte
      raw(i * 2 + 1) = (data(i) & 0xFF).toByte
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    filterPass(raw, width * channels * 2, height, channels * 2, filterOf, out)
    assemble(width, height, 16, colorType, interlaced = false, null,
      deflate(out.toByteArray))
  }

  case class Decoded(width: Int, height: Int, rgb: Array[Byte])

  /** Decode a PNG in the supported subset (see object doc) to 8-bit
    * RGB. Returns None for anything malformed: bad signature, CRC
    * mismatch, unsupported IHDR, truncated chunks, missing/short
    * PLTE, or inconsistent pixel data length.
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
    var depth = -1; var colorType = -1; var interlace = -1
    var palette: Array[Byte] = null
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
          depth = u(off + 16); colorType = u(off + 17)
          interlace = u(off + 20)
          if (u(off + 18) != 0 || u(off + 19) != 0) return None
          if (interlace > 1) return None
          val ok = colorType match {
            case 0 | 2 | 4 | 6 => depth == 8 || depth == 16
            case 3 => depth == 1 || depth == 2 || depth == 4 || depth == 8
            case _ => false
          }
          if (!ok) return None
          sawIhdr = true
        case "PLTE" =>
          if (len % 3 != 0 || len > 3 * 256 || len == 0) return None
          palette = java.util.Arrays.copyOfRange(p, off + 8,
            off + 8 + len.toInt)
        case "IDAT" => idat.write(p, off + 8, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      off += 12 + len.toInt
    }
    if (!sawIhdr || width <= 0 || height <= 0) return None
    if (colorType == 3 && palette == null) return None
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 3 => 1
      case 4 => 2
      case _ => 4
    }
    val bitspp = channels * depth
    val fbpp = math.max(1, bitspp / 8) // filter distance, bytes
    // passes: Adam7, or a single full-frame pass for interlace 0
    val passes: Seq[Int] = if (interlace == 1) 0 until 7 else Seq(-1)
    def dims(pass: Int): (Int, Int) =
      if (pass < 0) (width, height) else passDims(width, height, pass)
    // size arithmetic in Long: a crafted IHDR (e.g. 2^30 × 1) must be
    // rejected, not Int-overflow into a negative allocation; the raw
    // pixel data also can't exceed what a single byte array holds
    var expectL = 0L
    for (pass <- passes) {
      val (pw, ph) = dims(pass)
      if (pw > 0 && ph > 0)
        expectL += ph.toLong * (1L + (pw.toLong * bitspp + 7) / 8)
    }
    if (expectL > Int.MaxValue - 8 ||
      width.toLong * height.toLong * 3 > Int.MaxValue - 8) return None
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

    val rgb = new Array[Byte](width * height * 3)
    var base = 0 // offset of the current pass in `filtered`
    for (pass <- passes) {
      val (pw, ph) = dims(pass)
      if (pw > 0 && ph > 0) {
        val rowBytes = ((pw.toLong * bitspp + 7) / 8).toInt
        // unfilter this pass in place (each pass is an independent
        // sub-image: its first row has no "up" neighbor)
        val raw = new Array[Byte](rowBytes * ph)
        var y = 0
        while (y < ph) {
          val f = filtered(base + y * (rowBytes + 1)) & 0xFF
          var i2 = 0
          while (i2 < rowBytes) {
            val x = filtered(base + y * (rowBytes + 1) + 1 + i2) & 0xFF
            val left = if (i2 >= fbpp) raw(y * rowBytes + i2 - fbpp) & 0xFF else 0
            val up = if (y > 0) raw((y - 1) * rowBytes + i2) & 0xFF else 0
            val upLeft =
              if (y > 0 && i2 >= fbpp) raw((y - 1) * rowBytes + i2 - fbpp) & 0xFF
              else 0
            val pred = f match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) / 2
              case 4 => paeth(left, up, upLeft)
              case _ => return None
            }
            raw(y * rowBytes + i2) = ((x + pred) & 0xFF).toByte
            i2 += 1
          }
          y += 1
        }
        // scatter this pass's pixels into the full-resolution output
        val (xs, ys, xstep, ystep) =
          if (pass < 0) (0, 0, 1, 1)
          else (A7xStart(pass), A7yStart(pass), A7xStep(pass), A7yStep(pass))
        y = 0
        while (y < ph) {
          var x = 0
          while (x < pw) {
            val o = ((ys + y * ystep) * width + (xs + x * xstep)) * 3
            if (depth == 16) {
              // 16-bit samples are big-endian; output is 8-bit RGB, so
              // take the high byte (the PNG-recommended downsample)
              val at = y * rowBytes + x * channels * 2
              colorType match {
                case 0 | 4 => // gray (alpha dropped for 4)
                  val g = raw(at)
                  rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
                case _ => // RGB / RGBA (alpha dropped)
                  rgb(o) = raw(at); rgb(o + 1) = raw(at + 2)
                  rgb(o + 2) = raw(at + 4)
              }
            } else if (depth == 8) {
              val at = y * rowBytes + x * channels
              colorType match {
                case 0 =>
                  val g = raw(at)
                  rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
                case 2 =>
                  rgb(o) = raw(at); rgb(o + 1) = raw(at + 1)
                  rgb(o + 2) = raw(at + 2)
                case 3 =>
                  val idx = raw(at) & 0xFF
                  if (idx * 3 + 2 >= palette.length) return None
                  rgb(o) = palette(idx * 3); rgb(o + 1) = palette(idx * 3 + 1)
                  rgb(o + 2) = palette(idx * 3 + 2)
                case 4 => // gray + alpha: alpha dropped
                  val g = raw(at)
                  rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
                case _ => // RGBA: alpha dropped
                  rgb(o) = raw(at); rgb(o + 1) = raw(at + 1)
                  rgb(o + 2) = raw(at + 2)
              }
            } else { // sub-byte: palette only (channels == 1)
              val bitOff = x * depth
              val b = raw(y * rowBytes + bitOff / 8) & 0xFF
              val shift = 8 - depth - (bitOff % 8)
              val idx = (b >> shift) & ((1 << depth) - 1)
              if (idx * 3 + 2 >= palette.length) return None
              rgb(o) = palette(idx * 3); rgb(o + 1) = palette(idx * 3 + 1)
              rgb(o + 2) = palette(idx * 3 + 2)
            }
            x += 1
          }
          y += 1
        }
        base += ph * (rowBytes + 1)
      }
    }
    Some(Decoded(width, height, rgb))
  }
}
