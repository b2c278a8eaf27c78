package graft

import graft.multimodal.Png

/** The PNG codec is a real decoder (chunk walk + CRC32 verify + zlib
  * inflate + all five RFC 2083 unfilters), so its spec exercises each
  * failure edge independently of the planted-image formula the m7
  * oracle pins.
  */
class PngSpec extends SparkSpec {

  private def img(w: Int, h: Int)(f: (Int, Int, Int) => Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      rgb((y * w + x) * 3 + c) = f(y, x, c).toByte
    rgb
  }

  test("round-trips every scanline filter type exactly") {
    val rgb = img(7, 6)((y, x, c) => (y * 41 + x * 17 + c * 5) % 256)
    for (filter <- 0 to 4) {
      val d = Png.decode(Png.encode(7, 6, rgb, _ => filter))
        .getOrElse(fail(s"filter $filter did not decode"))
      assert(d.width == 7 && d.height == 6)
      assert(d.rgb.sameElements(rgb), s"filter $filter pixels")
    }
    // rotating filters per row (what the planted corpus does)
    val d = Png.decode(Png.encode(7, 6, rgb, y => y % 5)).get
    assert(d.rgb.sameElements(rgb))
  }

  test("reassembles multi-chunk IDAT (encoder always splits)") {
    val rgb = img(5, 5)((y, x, c) => y + x + c)
    val p = Png.encode(5, 5, rgb, _ => 4)
    val idatCount = p.sliding(4).count(_.sameElements("IDAT".getBytes))
    assert(idatCount == 2, "planted PNGs must exercise reassembly")
    assert(Png.decode(p).get.rgb.sameElements(rgb))
  }

  test("rejects corruption: CRC, signature, truncation, pixel bytes") {
    val p = Png.encode(4, 4, img(4, 4)((y, x, c) => y * x + c), _ => 2)
    assert(Png.decode(p).isDefined)
    val crcFlip = p.clone(); crcFlip(p.length - 5) = (crcFlip(p.length - 5) ^ 1).toByte
    assert(Png.decode(crcFlip).isEmpty, "IEND CRC flip")
    val dataFlip = p.clone(); dataFlip(41) = (dataFlip(41) ^ 1).toByte
    assert(Png.decode(dataFlip).isEmpty, "chunk byte flip fails CRC")
    assert(Png.decode(p.take(p.length - 7)).isEmpty, "truncated tail")
    assert(Png.decode(p.drop(1)).isEmpty, "bad signature")
    assert(Png.decode(Array.emptyByteArray).isEmpty)
  }

  test("Adam7 interlaced truecolor decodes to the identical image") {
    // every size class: smaller than one 8x8 tile, exact tiles, ragged
    for ((w, h) <- Seq((1, 1), (3, 2), (5, 7), (8, 8), (13, 9), (16, 17))) {
      val rgb = img(w, h)((y, x, c) => (y * 31 + x * 17 + c * 7) % 256)
      val plain = Png.decode(Png.encode(w, h, rgb, y => y % 5)).get
      val inter = Png.decode(Png.encodeInterlaced(w, h, rgb, y => y % 5)).get
      assert(inter.width == w && inter.height == h, s"$w x $h")
      assert(inter.rgb.sameElements(rgb), s"$w x $h interlaced pixels")
      assert(plain.rgb.sameElements(inter.rgb), s"$w x $h parity")
    }
  }

  test("palette decode expands PLTE at depths 8/4/2/1, plain and interlaced") {
    for (depth <- Seq(8, 4, 2, 1); inter <- Seq(false, true)) {
      val w = 11; val h = 6
      val psize = math.min(16, 1 << depth)
      val palette = Array.tabulate(psize * 3)(i => (i * 29 + 5).toByte)
      val indices = Array.tabulate(w * h)(i => (i * 7 + 3) % psize)
      val p = Png.encodePalette(w, h, depth, palette, indices, inter, _ % 5)
      val d = Png.decode(p).getOrElse(fail(s"depth=$depth inter=$inter"))
      for (i <- 0 until w * h; c <- 0 until 3)
        assert(d.rgb(i * 3 + c) == palette(indices(i) * 3 + c),
          s"depth=$depth inter=$inter pixel $i ch $c")
    }
  }

  test("grayscale, gray+alpha and RGBA decode to RGB (alpha dropped)") {
    val w = 7; val h = 5
    val gray = Array.tabulate(w * h)(i => (i * 11).toByte)
    val dg = Png.decode(Png.encodeRaw8(w, h, 0, gray, _ % 5)).get
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(dg.rgb(i * 3 + c) == gray(i))
    val ga = Array.tabulate(w * h * 2)(i => (i * 13).toByte)
    val dga = Png.decode(Png.encodeRaw8(w, h, 4, ga, _ % 5)).get
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(dga.rgb(i * 3 + c) == ga(i * 2))
    val rgba = Array.tabulate(w * h * 4)(i => (i * 7).toByte)
    val drgba = Png.decode(Png.encodeRaw8(w, h, 6, rgba, _ % 5)).get
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(drgba.rgb(i * 3 + c) == rgba(i * 4 + c))
  }

  test("16-bit samples decode via the high-byte downsample") {
    val w = 6; val h = 4
    // big-endian 16-bit: high byte = i pattern, low byte = noise the
    // downsample must ignore
    val rgb16 = Array.tabulate(w * h * 3)(i => ((i * 11 % 256) << 8) | 0xA7)
    val d = Png.decode(Png.encodeRaw16(w, h, 2, rgb16, _ % 5)).get
    for (i <- 0 until w * h * 3)
      assert((d.rgb(i) & 0xFF) == i * 11 % 256, s"byte $i")
    val g16 = Array.tabulate(w * h)(i => ((i * 19 % 256) << 8) | 0x33)
    val dg = Png.decode(Png.encodeRaw16(w, h, 0, g16, _ % 5)).get
    for (i <- 0 until w * h; c <- 0 until 3)
      assert((dg.rgb(i * 3 + c) & 0xFF) == i * 19 % 256)
    val rgba16 = Array.tabulate(w * h * 4)(i => ((i * 7 % 256) << 8) | 0xFF)
    val da = Png.decode(Png.encodeRaw16(w, h, 6, rgba16, _ % 5)).get
    for (i <- 0 until w * h; c <- 0 until 3)
      assert((da.rgb(i * 3 + c) & 0xFF) == (i * 4 + c) * 7 % 256)
  }

  test("palette images missing PLTE or with short PLTE reject cleanly") {
    val p = Png.encodePalette(4, 4, 4,
      Array.tabulate(16 * 3)(i => i.toByte),
      Array.tabulate(16)(i => i % 16), interlaced = false, _ => 0)
    assert(Png.decode(p).isDefined)
    // excise the PLTE chunk: IHDR is 25 bytes at offset 8; PLTE next
    val plteLen = 12 + 48
    val cut = p.take(33) ++ p.drop(33 + plteLen)
    assert(Png.decode(cut).isEmpty, "missing PLTE must reject")
  }

  test("paeth predictor matches RFC 2083 exactly") {
    assert(Png.paeth(1, 1, 1) == 1)
    assert(Png.paeth(10, 20, 15) == 15) // pc=0 beats pa=pb=5
    assert(Png.paeth(0, 10, 5) == 5)    // midpoint: upleft wins
    assert(Png.paeth(100, 50, 25) == 100)
    assert(Png.paeth(50, 100, 120) == 50)
    assert(Png.paeth(0, 0, 255) == 0)   // tie pa==pb: left preferred
  }
}
