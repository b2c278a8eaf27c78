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

  test("grayscale restart intervals round-trip exactly (RSTn resync)") {
    val w = 32; val h = 24
    val gray = img(w, h)((y, x) => 2 * (((y / 8) * 7 + (x / 8) * 11 + 3) % 128))
    for (ri <- Seq(1, 2, 3, 7)) {
      val d = Jpeg.decode(Jpeg.encode(w, h, gray, restartInterval = ri))
        .getOrElse(fail(s"restart interval $ri did not decode"))
      assert(d.gray.sameElements(gray), s"restart interval $ri")
    }
  }

  /** Constant-per-MCU YCbCr planes: luma even, chroma ≡ 128 mod 17 —
    * the m14 planting contract under which the lossy color codec is
    * bit-exact (DC-only DCT, exact quantizer division).
    */
  private def mcuPlanes(w: Int, h: Int, id: Int)
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    val yP = new Array[Byte](w * h)
    val cbP = new Array[Byte](w * h)
    val crP = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val my = y / 16; val mx = x / 16
      yP(y * w + x) = (2 * ((id * 29 + my * 13 + mx * 7) % 128)).toByte
      cbP(y * w + x) = (128 + 17 * (((id * 11 + my * 5 + mx * 3) % 15) - 7)).toByte
      crP(y * w + x) = (128 + 17 * (((id * 19 + my * 7 + mx * 5) % 15) - 7)).toByte
    }
    (yP, cbP, crP)
  }

  /** The JFIF conversion the decoder applies, mirrored per-pixel. */
  private def expectedRgb(w: Int, h: Int, yP: Array[Byte],
      cbP: Array[Byte], crP: Array[Byte]): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    def clamp(v: Double): Byte =
      math.max(0, math.min(255, math.floor(v + 0.5).toInt)).toByte
    for (i <- 0 until w * h) {
      val yv = yP(i) & 0xFF
      val cb = (cbP(i) & 0xFF) - 128
      val cr = (crP(i) & 0xFF) - 128
      rgb(i * 3) = clamp(yv + 1.402 * cr)
      rgb(i * 3 + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
      rgb(i * 3 + 2) = clamp(yv + 1.772 * cb)
    }
    rgb
  }

  test("constant-per-MCU color images are bit-exact: 4:4:4, 4:2:2, 4:2:0") {
    for (id <- 0 until 6;
        sub <- Seq(Jpeg.Sub444, Jpeg.Sub422, Jpeg.Sub420)) {
      val w = 16 * (1 + id % 3); val h = 16 * (1 + (id * 5) % 3)
      val (yP, cbP, crP) = mcuPlanes(w, h, id)
      val enc = Jpeg.encodeColor(w, h, yP, cbP, crP, subsample = sub)
      val d = Jpeg.decodeRgb(enc).getOrElse(fail(s"id=$id sub=$sub"))
      assert(d.width == w && d.height == h)
      assert(d.rgb.sameElements(expectedRgb(w, h, yP, cbP, crP)),
        s"id=$id sub=$sub must reconstruct exactly")
    }
  }

  test("color restart intervals round-trip exactly") {
    val id = 5
    val w = 32; val h = 48
    val (yP, cbP, crP) = mcuPlanes(w, h, id)
    for (sub <- Seq(Jpeg.Sub444, Jpeg.Sub422, Jpeg.Sub420);
        ri <- Seq(1, 2, 5)) {
      val enc = Jpeg.encodeColor(w, h, yP, cbP, crP, sub, restartInterval = ri)
      val d = Jpeg.decodeRgb(enc).getOrElse(fail(s"sub=$sub ri=$ri"))
      assert(d.rgb.sameElements(expectedRgb(w, h, yP, cbP, crP)),
        s"sub=$sub ri=$ri")
    }
  }

  test("arbitrary color images round-trip within quantization error") {
    val w = 40; val h = 24 // not MCU-aligned: exercises edge replication
    def plane(seed: Int) =
      Array.tabulate(w * h)(i => ((i / w) * 5 + (i % w) * 3 + seed * 31).toByte)
    val (yP, cbP, crP) = (plane(1), plane(2), plane(3))
    for (sub <- Seq(Jpeg.Sub444, Jpeg.Sub422, Jpeg.Sub420)) {
      val d = Jpeg.decodeRgb(Jpeg.encodeColor(w, h, yP, cbP, crP, sub)).get
      assert(d.width == w && d.height == h && d.rgb.length == w * h * 3)
    }
  }

  test("decodeRgb replicates grayscale to RGB; decode rejects color") {
    val w = 16; val h = 8
    val gray = img(w, h)((y, x) => 2 * ((y * 3 + x * 5) % 128))
    val enc = Jpeg.encode(w, h, gray)
    val dg = Jpeg.decode(enc).get
    val d = Jpeg.decodeRgb(enc).get
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(d.rgb(i * 3 + c) == dg.gray(i), "RGB must replicate decoded gray")
    val (yP, cbP, crP) = mcuPlanes(16, 16, 1)
    val color = Jpeg.encodeColor(16, 16, yP, cbP, crP, Jpeg.Sub444)
    assert(Jpeg.decode(color).isEmpty, "gray decode must reject 3-component")
    assert(Jpeg.decodeRgb(color).isDefined)
  }
}
