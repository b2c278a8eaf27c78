package graft

import graft.multimodal.Jpeg

/** The JPEG codec is a real baseline entropy coder/decoder; the spec
  * exercises the lossy round-trip on arbitrary images (AC runs, ZRL,
  * byte stuffing, edge-block crop) and the exact path on
  * constant-per-block images (what the m9 oracle pins).
  */
class JpegSpec extends SparkSpec {

  private def img(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i / w, i % w).toByte)

  test("constant-per-block images round-trip EXACTLY (even values)") {
    // constant 8x8 blocks have a DC-only DCT and q(0,0)=16 divides
    // 8*(v-128) exactly for even v — the m9 planting contract
    val w = 24; val h = 16
    val gray = img(w, h)((y, x) => 2 * (((y / 8) * 13 + (x / 8) * 29 + 7) % 128))
    val d = Jpeg.decode(Jpeg.encode(w, h, gray))
      .getOrElse(fail("did not decode"))
    assert(d.width == w && d.height == h)
    assert(d.gray.sameElements(gray), "DC-only blocks must be lossless")
  }

  test("arbitrary images round-trip within quantization error") {
    val w = 32; val h = 24
    val gray = img(w, h)((y, x) => (y * 31 + x * 57 + (x * y) % 41) % 256)
    val d = Jpeg.decode(Jpeg.encode(w, h, gray)).get
    assert(d.width == w && d.height == h)
    val maxErr = gray.indices.map(i =>
      math.abs((gray(i) & 0xFF) - (d.gray(i) & 0xFF))).max
    // Annex K luminance quantization bounds reconstruction error;
    // the point is the entropy stream (AC runs, categories, ZRL,
    // stuffing) survives decode — not rate-distortion quality
    assert(maxErr < 120, s"max pixel error $maxErr")
    val meanErr = gray.indices.map(i =>
      math.abs((gray(i) & 0xFF) - (d.gray(i) & 0xFF))).sum.toDouble / gray.length
    assert(meanErr < 30, s"mean pixel error $meanErr")
  }

  test("non-multiple-of-8 dimensions crop edge blocks correctly") {
    val w = 13; val h = 10
    val gray = img(w, h)((y, x) => 2 * ((y * 3 + x * 5) % 120))
    val d = Jpeg.decode(Jpeg.encode(w, h, gray)).get
    assert(d.width == w && d.height == h && d.gray.length == w * h)
  }

  test("smooth gradients survive with small error (DC + low AC)") {
    val w = 16; val h = 16
    val gray = img(w, h)((y, x) => 60 + y * 4 + x * 3)
    val d = Jpeg.decode(Jpeg.encode(w, h, gray)).get
    val maxErr = gray.indices.map(i =>
      math.abs((gray(i) & 0xFF) - (d.gray(i) & 0xFF))).max
    assert(maxErr <= 16, s"gradient max error $maxErr")
  }

  test("rejects malformed and unsupported payloads") {
    val good = Jpeg.encode(16, 8, img(16, 8)((y, x) => 2 * (y + x)))
    assert(Jpeg.decode(good).isDefined)
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty, "truncated")
    assert(Jpeg.decode(good.drop(1)).isEmpty, "missing SOI")
    assert(Jpeg.decode(Array.emptyByteArray).isEmpty)
    val progressive = good.clone()
    // flip SOF0 (FFC0) to SOF2 (FFC2): progressive must be rejected
    val sofAt = progressive.indices.find(i =>
      (progressive(i) & 0xFF) == 0xFF && i + 1 < progressive.length &&
        (progressive(i + 1) & 0xFF) == 0xC0).get
    progressive(sofAt + 1) = 0xC2.toByte
    assert(Jpeg.decode(progressive).isEmpty, "progressive SOF")
  }
}
