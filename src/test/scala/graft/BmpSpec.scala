package graft

import graft.multimodal.Bmp

/** The BMP codec's value is its layout wrinkles — BGR order, 4-byte
  * row padding, bottom-up vs top-down storage, and the RLE8 escape
  * machine — so each is exercised independently of the planted-image
  * formula the m24 oracle pins.
  */
class BmpSpec extends SparkSpec {

  private def img(w: Int, h: Int)(f: (Int, Int, Int) => Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      rgb((y * w + x) * 3 + c) = f(y, x, c).toByte
    rgb
  }

  test("24-bit round-trips identically in both row orders") {
    // w = 5 → raw row 15 bytes, padded to 16: the stride must skip
    // the pad or every row after the first shears.
    val rgb = img(5, 4)((y, x, c) => (y * 41 + x * 17 + c * 5) % 256)
    for (topDown <- Seq(false, true)) {
      val d = Bmp.decode(Bmp.encode24(5, 4, rgb, topDown))
        .getOrElse(fail(s"topDown=$topDown did not decode"))
      assert(d.width == 5 && d.height == 4 && d.compression == 0)
      assert(d.rgb.sameElements(rgb), s"topDown=$topDown pixels")
    }
    // The two encodings differ on disk (row order + sign of height)
    // but decode to the same pixels.
    assert(!Bmp.encode24(5, 4, rgb, topDown = false)
      .sameElements(Bmp.encode24(5, 4, rgb, topDown = true)))
  }

  test("RLE8 round-trips through encoded runs AND absolute mode") {
    val psize = 16
    val palette = Array.tabulate(psize * 3)(i => (i * 13 % 256).toByte)
    // Runs of 3 equal indices exercise encoded-run compression on
    // even storage rows; odd rows go through absolute mode (w = 7 is
    // odd, so the absolute block also needs its word-alignment pad).
    val indices = Array.tabulate(7 * 6) { i =>
      val y = i / 7; val x = i % 7
      (y * 5 + x / 3) % psize
    }
    val p = Bmp.encodeRle8(7, 6, palette, indices)
    val d = Bmp.decode(p).getOrElse(fail("RLE8 did not decode"))
    assert(d.width == 7 && d.height == 6 && d.compression == 1)
    val want = Array.tabulate(7 * 6 * 3) { i =>
      val c = i % 3
      palette(indices(i / 3) * 3 + c)
    }
    assert(d.rgb.sameElements(want))
  }

  test("RLE8 delta escape skips pixels, filling with palette entry 0") {
    // Hand-built stream: bottom row '2 2' then delta (+1, +1) then
    // '1 5', EOL, EOD — the skipped cells must read palette[0].
    val palette = Array.tabulate(8 * 3)(i => (i * 7 % 256).toByte)
    val head = Bmp.encodeRle8(4, 2, palette,
      Array.fill(4 * 2)(0)) // template for headers + palette
    val offBits = 14 + 40 + 8 * 4
    val stream = Array[Byte](2, 2, 0, 2, 1, 1, 1, 5, 0, 0, 0, 1)
    val p = head.take(offBits) ++ stream
    // patch bfSize so the header stays self-consistent
    val d = Bmp.decode(p).getOrElse(fail("delta stream did not decode"))
    assert(d.width == 4 && d.height == 2)
    // bottom storage row = top-down row 1: [2, 2, _, _] then the
    // delta jumps x to 3 AND up one row; row 1's tail fills with 0.
    def px(y: Int, x: Int): Int = {
      val j = (0 until 8).find(j0 =>
        (0 until 3).forall(c =>
          d.rgb((y * 4 + x) * 3 + c) == palette(j0 * 3 + c))).get
      j
    }
    assert(px(1, 0) == 2 && px(1, 1) == 2)
    assert(px(1, 2) == 0 && px(1, 3) == 0)
    // after the delta: storage row 1 (top-down row 0), x = 3 gets 5
    assert(px(0, 3) == 5)
    assert(px(0, 0) == 0 && px(0, 1) == 0 && px(0, 2) == 0)
  }

  test("V4 header (biSize=108): palette reads past the extension") {
    // Re-frame an RLE8 payload under a BITMAPV4HEADER: 68 extension
    // bytes between the core header and the palette. A decoder that
    // assumes the palette at byte 54 would read mask/color-space
    // fields as colors.
    val palette = Array.tabulate(8 * 3)(i => (i * 11 % 256).toByte)
    val indices = Array.tabulate(6 * 4)(i => i % 8)
    val p40 = Bmp.encodeRle8(6, 4, palette, indices)
    val want = Bmp.decode(p40).get
    val ext = 68
    val v4 = new Array[Byte](p40.length + ext)
    System.arraycopy(p40, 0, v4, 0, 54) // file header + core info
    System.arraycopy(p40, 54, v4, 54 + ext, p40.length - 54)
    def put32(off: Int, v: Int): Unit = {
      v4(off) = (v & 0xFF).toByte
      v4(off + 1) = ((v >> 8) & 0xFF).toByte
      v4(off + 2) = ((v >> 16) & 0xFF).toByte
      v4(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def get32(off: Int): Int =
      (v4(off) & 0xFF) | ((v4(off + 1) & 0xFF) << 8) |
        ((v4(off + 2) & 0xFF) << 16) | ((v4(off + 3) & 0xFF) << 24)
    put32(14, 108)               // biSize: V4
    put32(2, get32(2) + ext)     // bfSize
    put32(10, get32(10) + ext)   // bfOffBits
    val d = Bmp.decode(v4).getOrElse(fail("V4 BMP did not decode"))
    assert(d.width == want.width && d.height == want.height)
    assert(d.rgb.sameElements(want.rgb),
      "V4 palette must decode identically to the core-header framing")
  }

  test("rejects corruption: magic, truncation, oversize, bad index") {
    val rgb = img(4, 4)((y, x, c) => y + x + c)
    val good = Bmp.encode24(4, 4, rgb, topDown = false)
    assert(Bmp.decode(good).isDefined)
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Bmp.decode(badMagic).isEmpty)
    assert(Bmp.decode(good.take(good.length - 5)).isEmpty)
    assert(Bmp.decode(good.take(30)).isEmpty)
    // width forged to a giant value → pixel-count bound rejects
    val huge = good.clone()
    huge(18) = 0; huge(19) = 0; huge(20) = 16; huge(21) = 0 // w = 2^20
    assert(Bmp.decode(huge).isEmpty)
    // RLE run referencing an out-of-palette index
    val palette = Array.tabulate(4 * 3)(i => i.toByte)
    val rle = Bmp.encodeRle8(4, 2, palette, Array.fill(8)(1))
    val offBits = 14 + 40 + 4 * 4
    val evil = rle.clone(); evil(offBits + 1) = 9 // index 9 of 4
    assert(Bmp.decode(evil).isEmpty)
  }

  test("decode is total on arbitrary bytes (never throws)") {
    val rnd = new scala.util.Random(0xB3B)
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(200)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      // seed some with a valid magic + plausible header bytes
      if (n > 2 && rnd.nextBoolean()) { bytes(0) = 'B'; bytes(1) = 'M' }
      Bmp.decode(bytes) // must return, never throw
    }
    // mutate real payloads byte-by-byte
    val rgb = img(4, 4)((y, x, c) => y * x + c)
    val p24 = Bmp.encode24(4, 4, rgb, topDown = false)
    val prle = Bmp.encodeRle8(4, 4,
      Array.tabulate(4 * 3)(_.toByte), Array.fill(16)(2))
    for (base <- Seq(p24, prle); i <- base.indices) {
      val m = base.clone()
      m(i) = (m(i) ^ 0x55).toByte
      Bmp.decode(m)
    }
  }
}
