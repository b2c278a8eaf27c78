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

  test("paeth predictor matches RFC 2083 exactly") {
    assert(Png.paeth(1, 1, 1) == 1)
    assert(Png.paeth(10, 20, 15) == 15) // pc=0 beats pa=pb=5
    assert(Png.paeth(0, 10, 5) == 5)    // midpoint: upleft wins
    assert(Png.paeth(100, 50, 25) == 100)
    assert(Png.paeth(50, 100, 120) == 50)
    assert(Png.paeth(0, 0, 255) == 0)   // tie pa==pb: left preferred
  }
}
