package graft.multimodal

/** A real (minimal) baseline JPEG codec — pure JVM, no image
  * libraries. Grayscale AND 3-component YCbCr color (4:4:4, 4:2:2
  * and 4:2:0 layouts), the ITU T.81 baseline sequential DCT subset
  * plus restart intervals — the shape of virtually every JPEG in a
  * web crawl.
  *
  * The ENCODER is a full forward path (color conversion is the
  * caller's: planes arrive as Y/Cb/Cr; level shift → 2-D DCT →
  * quantization → per-component DC prediction → run-length AC
  * coding → canonical Huffman entropy coding with 0xFF byte
  * stuffing, optional DRI/RSTn restart markers) using the public
  * ITU T.81 Annex K example luminance AND chrominance tables; the
  * DECODER is the capability: marker walk, DQT/DHT/SOF0/SOS/DRI
  * parsing, canonical Huffman table reconstruction
  * (mincode/maxcode/valptr), the stuffed-bit reader with RSTn
  * resynchronization, DC-difference EXTEND, AC run-length with
  * EOB/ZRL, dequantization through the zigzag, a separable floating
  * IDCT with level shift and clamping, nearest-neighbor chroma
  * upsampling, and the JFIF YCbCr→RGB transform.
  *
  * m9 plants constant-per-block grayscale images (whose DCT is
  * DC-only and exactly recomputable by the oracle with no decoder);
  * m14 plants constant-per-MCU YCbCr images whose chroma constants
  * are ≡128 (mod 17) so the Annex K chroma table quantizes them
  * exactly too; JpegSpec round-trips arbitrary images through the
  * full lossy path.
  */
object Jpeg {

  /** Chroma layouts for [[encodeColor]]. */
  val Sub444 = 0 // no subsampling (Y 1x1)
  val Sub422 = 1 // horizontal-only (Y 2x1)
  val Sub420 = 2 // horizontal + vertical (Y 2x2)

  /** Zigzag scan order: zigzag(i) = natural index of the i-th
    * coefficient in scan order (T.81 Figure 5).
    */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** T.81 Annex K.1 example luminance quantization table (natural
    * row-major order). q(0,0) = 16: an even level-shifted constant
    * block quantizes exactly (8c/16 = c/2), which is what makes the
    * planted m9 corpus oracle-computable.
    */
  val QuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** T.81 Annex K.2 example chrominance quantization table.
    * q(0,0) = 17: a constant chroma block with level-shifted value
    * ≡ 0 (mod 17) quantizes exactly (8·17k/17 = 8k) — the m14
    * planting contract (chroma values 128 + 17k).
    */
  val QuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K.3.1: luminance DC code counts per length and symbols. */
  val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcVals: Array[Int] = (0 to 11).toArray

  /** Annex K.3.2: luminance AC code counts per length and symbols. */
  val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Annex K.3.3: chrominance DC code counts and symbols. */
  val DcChromaBits: Array[Int] =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  val DcChromaVals: Array[Int] = (0 to 11).toArray

  /** Annex K.3.4: chrominance AC code counts and symbols. */
  val AcChromaBits: Array[Int] =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // cos((2n+1)·k·π/16) and the C(k) normalization, shared by both
  // DCT directions
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (k, n) =>
    math.cos((2 * n + 1) * k * math.Pi / 16.0)
  }
  private val Cn: Array[Double] =
    Array.tabulate(8)(k => if (k == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Canonical Huffman code assignment (T.81 Annex C): symbols sorted
    * by code length get sequential codes.
    */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out += vals(vi) -> (code, l)
        code += 1; vi += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit =
      if (nbits > 0) { put((1 << (8 - nbits)) - 1, 8 - nbits) }
  }

  /** Magnitude category (number of bits) of a DC diff / AC value. */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Forward DCT + quantize + entropy-code one level-shifted 8×8
    * block; returns the new DC prediction for this component.
    */
  private def encodeBlock(bw: BitWriter, block: Array[Double],
      quant: Array[Int], dcCodes: Map[Int, (Int, Int)],
      acCodes: Map[Int, (Int, Int)], pred: Int): Int = {
    val coef = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            sum += block(yy * 8 + xx) * Cos(u)(yy) * Cos(v)(xx)
            xx += 1
          }
          yy += 1
        }
        val f = 0.25 * Cn(u) * Cn(v) * sum
        coef(u * 8 + v) = math.round(f / quant(u * 8 + v)).toInt
        v += 1
      }
      u += 1
    }
    def putValue(v: Int, s: Int): Unit =
      bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
    // DC
    val diff = coef(0) - pred
    val s = category(diff)
    val (dc, dl) = dcCodes(s)
    bw.put(dc, dl)
    if (s > 0) putValue(diff, s)
    // AC: run-length through the zigzag with ZRL and EOB
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coef(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) {
          val (zc, zl) = acCodes(0xF0); bw.put(zc, zl) // ZRL
          run -= 16
        }
        val sz = category(v)
        val (ac, al) = acCodes((run << 4) | sz)
        bw.put(ac, al)
        putValue(v, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) } // EOB
    coef(0)
  }

  /** Fill a level-shifted 8×8 block from `plane` at (x0, y0), edge
    * pixels replicated (standard practice).
    */
  private def fillBlock(block: Array[Double], plane: Array[Byte],
      w: Int, h: Int, x0: Int, y0: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val sy = math.min(y0 + y, h - 1)
        val sx = math.min(x0 + x, w - 1)
        block(y * 8 + x) = (plane(sy * w + sx) & 0xFF) - 128.0
        x += 1
      }
      y += 1
    }
  }

  private def writeHeaders(out: java.io.ByteArrayOutputStream,
      width: Int, height: Int, color: Boolean, subsample: Int,
      restartInterval: Int): Unit = {
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def be2(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    marker(0xD8) // SOI
    marker(0xE0); be2(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); be2(1); be2(1)
    out.write(0); out.write(0)
    marker(0xDB); be2(2 + 1 + 64); out.write(0) // DQT, 8-bit, id 0
    Zigzag.foreach(n => out.write(QuantLuma(n)))
    if (color) {
      marker(0xDB); be2(2 + 1 + 64); out.write(1) // DQT id 1 (chroma)
      Zigzag.foreach(n => out.write(QuantChroma(n)))
    }
    val ncomp = if (color) 3 else 1
    marker(0xC0); be2(8 + 3 * ncomp) // SOF0: baseline
    out.write(8); be2(height); be2(width); out.write(ncomp)
    out.write(1) // component id 1 (Y)
    out.write(if (color) subsample match {
      case Sub420 => 0x22
      case Sub422 => 0x21
      case _ => 0x11
    } else 0x11)
    out.write(0)
    if (color) {
      out.write(2); out.write(0x11); out.write(1) // Cb
      out.write(3); out.write(0x11); out.write(1) // Cr
    }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4); be2(2 + 1 + 16 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, 0, DcBits, DcVals)
    dht(1, 0, AcBits, AcVals)
    if (color) {
      dht(0, 1, DcChromaBits, DcChromaVals)
      dht(1, 1, AcChromaBits, AcChromaVals)
    }
    if (restartInterval > 0) { marker(0xDD); be2(4); be2(restartInterval) }
    marker(0xDA); be2(6 + 2 * ncomp) // SOS
    out.write(ncomp)
    out.write(1); out.write(0x00)
    if (color) {
      out.write(2); out.write(0x11)
      out.write(3); out.write(0x11)
    }
    out.write(0); out.write(63); out.write(0)
  }

  /** Encode an 8-bit grayscale image as baseline JPEG with the Annex
    * K tables: full forward DCT + quantization + entropy coding.
    */
  def encode(width: Int, height: Int, gray: Array[Byte],
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      "SOF0 carries dimensions as u16")
    require(gray.length == width * height, "gray must be w*h bytes")
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, width, height, color = false, subsample = Sub444,
      restartInterval)
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    var bw = new BitWriter(out)
    val block = new Array[Double](64)
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    var pred = 0
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flushWithOnes()
          out.write(0xFF); out.write(0xD0 + rst)
          rst = (rst + 1) % 8
          pred = 0
          bw = new BitWriter(out)
        }
        fillBlock(block, gray, width, height, bx * 8, by * 8)
        pred = encodeBlock(bw, block, QuantLuma, dcCodes, acCodes, pred)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flushWithOnes()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Encode a 3-component YCbCr image as baseline JPEG. The caller
    * supplies FULL-RESOLUTION Y/Cb/Cr planes (a real ingest pipeline
    * converts RGB→YCbCr upstream; planting directly in YCbCr is what
    * makes the m14 corpus lossless-recomputable). `subsample` picks
    * the chroma layout: [[Sub420]] (Y 2×2 per MCU, chroma
    * box-averaged to half resolution both axes), [[Sub422]]
    * (horizontal-only), or [[Sub444]]. Optional restart markers
    * every `restartInterval` MCUs (DRI + RSTn).
    */
  def encodeColor(width: Int, height: Int, yP: Array[Byte],
      cbP: Array[Byte], crP: Array[Byte], subsample: Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      "SOF0 carries dimensions as u16")
    require(yP.length == width * height && cbP.length == width * height &&
      crP.length == width * height, "planes must be w*h bytes")
    require(subsample == Sub444 || subsample == Sub422 ||
      subsample == Sub420, s"unknown layout $subsample")
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, width, height, color = true, subsample, restartInterval)
    val dcY = canonicalCodes(DcBits, DcVals)
    val acY = canonicalCodes(AcBits, AcVals)
    val dcC = canonicalCodes(DcChromaBits, DcChromaVals)
    val acC = canonicalCodes(AcChromaBits, AcChromaVals)
    val hvH = if (subsample == Sub444) 1 else 2
    val hvV = if (subsample == Sub420) 2 else 1
    // chroma planes at component resolution: rounded box average of
    // the hvH × hvV neighborhood (identity for 4:4:4)
    val cw = (width + hvH - 1) / hvH
    val ch = (height + hvV - 1) / hvV
    def subsampled(p: Array[Byte]): Array[Byte] =
      if (hvH == 1 && hvV == 1) p
      else {
        val o = new Array[Byte](cw * ch)
        var y = 0
        while (y < ch) {
          var x = 0
          while (x < cw) {
            var sum = 0; var n = 0
            var dy = 0
            while (dy < hvV) {
              var dx = 0
              while (dx < hvH) {
                val sy = y * hvV + dy; val sx = x * hvH + dx
                if (sy < height && sx < width) {
                  sum += p(sy * width + sx) & 0xFF; n += 1
                }
                dx += 1
              }
              dy += 1
            }
            o(y * cw + x) = ((sum + n / 2) / n).toByte
            x += 1
          }
          y += 1
        }
        o
      }
    val cbS = subsampled(cbP)
    val crS = subsampled(crP)
    var bw = new BitWriter(out)
    val block = new Array[Double](64)
    val mcusX = (width + 8 * hvH - 1) / (8 * hvH)
    val mcusY = (height + 8 * hvV - 1) / (8 * hvV)
    var predY = 0; var predCb = 0; var predCr = 0
    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flushWithOnes()
          out.write(0xFF); out.write(0xD0 + rst)
          rst = (rst + 1) % 8
          predY = 0; predCb = 0; predCr = 0
          bw = new BitWriter(out)
        }
        // Y blocks: hvH × hvV per MCU, raster order within the MCU
        var byi = 0
        while (byi < hvV) {
          var bxi = 0
          while (bxi < hvH) {
            fillBlock(block, yP, width, height,
              (mx * hvH + bxi) * 8, (my * hvV + byi) * 8)
            predY = encodeBlock(bw, block, QuantLuma, dcY, acY, predY)
            bxi += 1
          }
          byi += 1
        }
        fillBlock(block, cbS, cw, ch, mx * 8, my * 8)
        predCb = encodeBlock(bw, block, QuantChroma, dcC, acC, predCb)
        fillBlock(block, crS, cw, ch, mx * 8, my * 8)
        predCr = encodeBlock(bw, block, QuantChroma, dcC, acC, predCr)
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flushWithOnes()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  case class Decoded(width: Int, height: Int, gray: Array[Byte])
  case class DecodedRgb(width: Int, height: Int, rgb: Array[Byte])

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // T.81 Annex F.2.2.3 canonical decode tables
    val maxcode = new Array[Int](17)
    val mincode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var vi = 0
      for (l <- 1 to 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = vi
          mincode(l) = code
          code += bits(l - 1); vi += bits(l - 1)
          maxcode(l) = code - 1
        } else maxcode(l) = -1
        code <<= 1
      }
    }
    def value(l: Int, code: Int): Int = vals(valptr(l) + code - mincode(l))
  }

  private final class BitReader(p: Array[Byte], var pos: Int, end: Int) {
    private var acc = 0
    private var nbits = 0
    /** -1 when the entropy segment is exhausted (marker reached). */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= end) return -1
        var b = p(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= end) return -1
          val nxt = p(pos) & 0xFF
          if (nxt == 0x00) pos += 1 // stuffed literal 0xFF
          else { pos -= 1; return -1 } // a real marker: rewind to its 0xFF
          b = 0xFF
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = bit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1
      }
      v
    }
    /** Drop pad bits and consume the expected RSTn marker (T.81
      * F.2.1.3.1); false if the stream doesn't resynchronize.
      */
    def expectRst(n: Int): Boolean = {
      acc = 0; nbits = 0
      if (pos + 1 >= end) return false
      while (pos + 1 < end && (p(pos) & 0xFF) == 0xFF &&
        (p(pos + 1) & 0xFF) == 0xFF) pos += 1 // fill bytes
      if ((p(pos) & 0xFF) != 0xFF || (p(pos + 1) & 0xFF) != (0xD0 + n))
        return false
      pos += 2
      true
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline GRAYSCALE JPEG (the m9 contract). Color
    * payloads are rejected here — use [[decodeRgb]] for the general
    * path. Returns None for anything malformed or outside the
    * supported subset.
    */
  def decode(p: Array[Byte]): Option[Decoded] =
    decodeComponents(p).collect {
      case d if d.ncomp == 1 => Decoded(d.width, d.height, d.planes(0))
    }

  /** Decode a baseline JPEG to RGB: grayscale replicates the single
    * plane; 3-component applies nearest-neighbor chroma upsampling
    * and the JFIF YCbCr→RGB transform (R = Y + 1.402·(Cr−128),
    * G = Y − 0.344136·(Cb−128) − 0.714136·(Cr−128),
    * B = Y + 1.772·(Cb−128), rounded and clamped). Returns None for
    * anything malformed or outside the supported subset.
    */
  def decodeRgb(p: Array[Byte]): Option[DecodedRgb] =
    decodeComponents(p).map { d =>
      val w = d.width; val h = d.height
      val rgb = new Array[Byte](w * h * 3)
      if (d.ncomp == 1) {
        val g = d.planes(0)
        var i = 0
        while (i < w * h) {
          val v = g(i)
          rgb(i * 3) = v; rgb(i * 3 + 1) = v; rgb(i * 3 + 2) = v
          i += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yv = d.sample(0, y, x)
            val cb = d.sample(1, y, x) - 128
            val cr = d.sample(2, y, x) - 128
            def clamp(v: Double): Byte = {
              val r = math.floor(v + 0.5).toInt
              math.max(0, math.min(255, r)).toByte
            }
            val o = (y * w + x) * 3
            rgb(o) = clamp(yv + 1.402 * cr)
            rgb(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
            rgb(o + 2) = clamp(yv + 1.772 * cb)
            x += 1
          }
          y += 1
        }
      }
      DecodedRgb(w, h, rgb)
    }

  /** Per-component decode result: planes are at PADDED component
    * resolution (multiples of 8 per sampling grid); `sample` maps a
    * full-resolution pixel to its component sample (nearest
    * neighbor).
    */
  private case class Components(width: Int, height: Int, ncomp: Int,
      planes: Array[Array[Byte]], planeW: Array[Int],
      hs: Array[Int], vs: Array[Int], hmax: Int, vmax: Int) {
    def sample(c: Int, y: Int, x: Int): Int =
      planes(c)((y * vs(c) / vmax) * planeW(c) + (x * hs(c) / hmax)) & 0xFF
  }

  private def decodeComponents(p: Array[Byte]): Option[Components] =
    try decodeImpl(p)
    catch {
      // truncated segments land on array bounds rather than each read
      // carrying its own guard; malformed input is None, never a throw
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def decodeImpl(p: Array[Byte]): Option[Components] = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8)
      return None
    def u2(i: Int): Int = ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)
    var off = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var width = -1; var height = -1
    var ncomp = 0
    val compId = new Array[Int](3)
    val compH = new Array[Int](3)
    val compV = new Array[Int](3)
    val compQ = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    var restartInterval = 0
    var scanStart = -1
    while (scanStart < 0) {
      if (off + 2 > p.length) return None
      if ((p(off) & 0xFF) != 0xFF) return None
      var m = p(off + 1) & 0xFF
      while (m == 0xFF) { off += 1; m = p(off + 1) & 0xFF } // fill bytes
      off += 2
      m match {
        case 0xD9 => return None // EOI before any scan
        case 0xC0 | 0xC1 => // baseline / extended sequential
          val len = u2(off)
          if (p(off + 2) != 8) return None // 8-bit precision only
          height = u2(off + 3); width = u2(off + 5)
          ncomp = p(off + 7) & 0xFF
          if (ncomp != 1 && ncomp != 3) return None
          var c = 0
          while (c < ncomp) {
            compId(c) = p(off + 8 + 3 * c) & 0xFF
            val hv = p(off + 9 + 3 * c) & 0xFF
            compH(c) = hv >> 4; compV(c) = hv & 0x0F
            compQ(c) = p(off + 10 + 3 * c) & 0xFF
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 ||
              compV(c) > 2 || compQ(c) > 3) return None
            c += 1
          }
          if (ncomp == 1) { compH(0) = 1; compV(0) = 1 } // sampling moot
          off += len
        case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
            0xCD | 0xCE | 0xCF =>
          return None // progressive/hierarchical/arithmetic unsupported
        case 0xDB =>
          val len = u2(off)
          var q = off + 2
          while (q < off + len) {
            val pq = (p(q) & 0xFF) >> 4
            val tq = p(q) & 0x0F
            if (pq != 0 || tq > 3 || q + 65 > off + len) return None
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(Zigzag(i)) = p(q + 1 + i) & 0xFF; i += 1 }
            quant(tq) = t
            q += 65
          }
          off += len
        case 0xC4 =>
          val len = u2(off)
          var q = off + 2
          while (q < off + len) {
            val tc = (p(q) & 0xFF) >> 4
            val th = p(q) & 0x0F
            if (tc > 1 || th > 3 || q + 17 > off + len) return None
            val bits = Array.tabulate(16)(i => p(q + 1 + i) & 0xFF)
            val n = bits.sum
            if (q + 17 + n > off + len) return None
            val vals = Array.tabulate(n)(i => p(q + 17 + i) & 0xFF)
            val tab = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            q += 17 + n
          }
          off += len
        case 0xDD =>
          if (u2(off) != 4) return None
          restartInterval = u2(off + 2)
          off += u2(off)
        case 0xDA =>
          val len = u2(off)
          val ns = p(off + 2) & 0xFF
          if (ns != ncomp) return None // interleaved full scan only
          var c = 0
          while (c < ns) {
            val id = p(off + 3 + 2 * c) & 0xFF
            val sel = p(off + 4 + 2 * c) & 0xFF
            val idx = compId.indexOf(id)
            if (idx < 0 || idx >= ncomp) return None
            compDc(idx) = sel >> 4
            compAc(idx) = sel & 0x0F
            c += 1
          }
          val so = off + 3 + 2 * ns
          if ((p(so) & 0xFF) != 0 || (p(so + 1) & 0xFF) != 63)
            return None // full spectral range only
          scanStart = off + len
        case _ => // APPn / COM / other: skip by length
          if (off + 2 > p.length || u2(off) < 2) return None
          off += u2(off)
      }
    }
    if (width <= 0 || height <= 0 || ncomp == 0) return None
    val hmax = compH.take(ncomp).max
    val vmax = compV.take(ncomp).max
    // both dims are u16 so the product bounds at ~2^32: size in Long
    // and reject what byte arrays can't hold rather than
    // Int-overflowing into a negative allocation
    if (width.toLong * height.toLong * 3 > Int.MaxValue - 8) return None
    var c = 0
    while (c < ncomp) {
      if (quant(compQ(c)) == null) return None
      if (dcTabs(compDc(c)) == null || acTabs(compAc(c)) == null) return None
      c += 1
    }
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val planeW = Array.tabulate(ncomp)(i => mcusX * compH(i) * 8)
    val planeH = Array.tabulate(ncomp)(i => mcusY * compV(i) * 8)
    val planes = Array.tabulate(ncomp)(i => new Array[Byte](planeW(i) * planeH(i)))

    val br = new BitReader(p, scanStart, p.length)
    def huff(t: HuffTable): Int = {
      var code = br.bit()
      if (code < 0) return -1
      var l = 1
      while (code > t.maxcode(l)) {
        val b = br.bit(); if (b < 0) return -1
        code = (code << 1) | b
        l += 1
        if (l > 16) return -1
      }
      t.value(l, code)
    }

    val coef = new Array[Int](64)
    val pix = new Array[Double](64)
    val preds = new Array[Int](ncomp)

    /** Entropy-decode + dequant + IDCT one block into plane `c` at
      * block coords (bx, by); false on a corrupt stream.
      */
    def decodeBlock(c: Int, bx: Int, by: Int): Boolean = {
      val qt = quant(compQ(c))
      java.util.Arrays.fill(coef, 0)
      val s = huff(dcTabs(compDc(c)))
      if (s < 0 || s > 11) return false
      val dv = br.receive(s)
      if (dv == Int.MinValue) return false
      preds(c) += extend(dv, s)
      coef(0) = preds(c) * qt(0)
      var k = 1
      var done = false
      while (k < 64 && !done) {
        val rs = huff(acTabs(compAc(c)))
        if (rs < 0) return false
        val r = rs >> 4
        val sz = rs & 0x0F
        if (sz == 0) {
          if (r == 15) k += 16 // ZRL
          else done = true // EOB
        } else {
          k += r
          if (k > 63) return false
          val av = br.receive(sz)
          if (av == Int.MinValue) return false
          coef(Zigzag(k)) = extend(av, sz) * qt(Zigzag(k))
          k += 1
        }
      }
      // separable-equivalent naive IDCT, level shift, clamp
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var sum = 0.0
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              val cc = coef(u * 8 + v)
              if (cc != 0) sum += Cn(u) * Cn(v) * cc * Cos(u)(y) * Cos(v)(x)
              v += 1
            }
            u += 1
          }
          pix(y * 8 + x) = 0.25 * sum + 128.0
          x += 1
        }
        y += 1
      }
      val pw = planeW(c)
      val plane = planes(c)
      var yy = 0
      while (yy < 8) {
        val row = (by * 8 + yy) * pw + bx * 8
        var xx = 0
        while (xx < 8) {
          val v = math.round(pix(yy * 8 + xx)).toInt
          plane(row + xx) = math.max(0, math.min(255, v)).toByte
          xx += 1
        }
        yy += 1
      }
      true
    }

    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.expectRst(rst)) return None
          rst = (rst + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        var c2 = 0
        while (c2 < ncomp) {
          var byi = 0
          while (byi < compV(c2)) {
            var bxi = 0
            while (bxi < compH(c2)) {
              if (!decodeBlock(c2, mx * compH(c2) + bxi, my * compV(c2) + byi))
                return None
              bxi += 1
            }
            byi += 1
          }
          c2 += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // crop padded planes? Not materially: `sample` only reads inside
    // (width, height) scaled per component, so padding never leaks.
    // For the single-component case callers read planes(0) directly —
    // crop it to exact (width, height) there.
    if (ncomp == 1 && (planeW(0) != width || planeH(0) != height)) {
      val cropped = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * planeW(0), cropped, y * width, width)
        y += 1
      }
      planes(0) = cropped
      planeW(0) = width
    }
    Some(Components(width, height, ncomp, planes, planeW,
      compH.take(ncomp), compV.take(ncomp), hmax, vmax))
  }
}
