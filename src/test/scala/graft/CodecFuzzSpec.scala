package graft

import graft.multimodal.{Gif, Ico, Jpeg, Mp3, Netpbm, Png, Tiff, Wav}

/** Deterministic fuzz for the pure-JVM codecs: at corpus scale the
  * decoders face untrusted bytes, so the contract is total — every
  * input returns Some/None, never a throw — and valid files survive
  * single-byte corruption as a CLEAN rejection or a well-formed
  * decode, never an exception. Fixed seeds keep failures
  * reproducible.
  */
class CodecFuzzSpec extends SparkSpec {

  test("decoders are total on arbitrary bytes") {
    val rnd = new scala.util.Random(0x5EED)
    val pngMagic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    val riffMagic = "RIFF0000WAVE".getBytes("US-ASCII")
    val jpegMagic = Array(0xFF, 0xD8, 0xFF).map(_.toByte)
    for (_ <- 1 to 600) {
      val body = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Png.decode(body); Wav.decode(body); Jpeg.decode(body)
      Jpeg.decodeRgb(body); Gif.decode(body); Gif.decodeFrames(body)
      // past the signature check, into the chunk/marker walkers
      Png.decode(pngMagic ++ body)
      Wav.decode(riffMagic ++ body)
      Jpeg.decode(jpegMagic ++ body)
      Jpeg.decodeRgb(jpegMagic ++ body)
      Gif.decode("GIF89a".getBytes("US-ASCII") ++ body)
      Gif.decodeFrames("GIF89a".getBytes("US-ASCII") ++ body)
      Gif.animMeta(body)
      Gif.animMeta("GIF89a".getBytes("US-ASCII") ++ body)
      Netpbm.decode(body)
      Netpbm.decode("P6\n".getBytes("US-ASCII") ++ body)
      Netpbm.decode("P5 #".getBytes("US-ASCII") ++ body)
      Mp3.parse(body)
      // past the ID3 magic + a valid v2.3 version, into the tag walker
      Mp3.parse("ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0) ++ body)
      Tiff.parse(body)
      // past the byte-order magic, into the IFD machine (both orders)
      Tiff.parse("II".getBytes("US-ASCII") ++ Array[Byte](42, 0) ++ body)
      Tiff.parse("MM".getBytes("US-ASCII") ++ Array[Byte](0, 42) ++ body)
      Ico.parse(body)
      // past the ICONDIR magic, into the directory/entry walkers
      Ico.parse(Array[Byte](0, 0, 1, 0) ++ body)
    }
    succeed
  }

  test("single-byte corruption and truncation of valid files never throw") {
    val png = Png.encode(6, 5, Array.tabulate(90)(i => (i * 7).toByte),
      y => y % 5)
    val palPng = Png.encodePalette(9, 7, 4,
      Array.tabulate(48)(i => (i * 19).toByte),
      Array.tabulate(63)(i => (i * 5) % 16), interlaced = true, _ % 5)
    val wav = Wav.encode(8000, 2,
      Array.tabulate(24)(i => (i * 1000 - 12000).toShort))
    val jpg = Jpeg.encode(16, 8, Array.tabulate(128)(i => (i * 3).toByte))
    val colorJpg = Jpeg.encodeColor(16, 16,
      Array.tabulate(256)(i => (i * 2).toByte),
      Array.tabulate(256)(i => (128 + i % 16).toByte),
      Array.tabulate(256)(i => (128 - i % 16).toByte),
      subsample = Jpeg.Sub420, restartInterval = 1)
    val gif = Gif.encode(9, 7, 4, Array.tabulate(48)(i => (i * 19).toByte),
      Array.tabulate(63)(i => ((i * 5) % 16).toByte), interlaced = true)
    val animGif = Gif.encodeAnimated(9, 7, 4,
      Array.tabulate(48)(i => (i * 19).toByte),
      Seq(
        Gif.FrameSpec(0, 0, 9, 7,
          Array.tabulate(63)(i => ((i * 5) % 16).toByte)),
        Gif.FrameSpec(2, 1, 4, 4,
          Array.tabulate(16)(i => ((i * 3) % 16).toByte),
          disposal = 2, transparent = 5),
        Gif.FrameSpec(4, 2, 3, 3,
          Array.tabulate(9)(i => ((i * 7) % 16).toByte),
          disposal = 3, transparent = 1, interlaced = true)))
    val ppm = Netpbm.encode(6, 5, 4, 255,
      Array.tabulate(60)(i => (i * 7) % 256), comment = "fuzz base")
    val pgm16 = Netpbm.encode(5, 4, 6, 1000,
      Array.tabulate(24)(i => (i * 131) % 1001))
    val mp3 = Mp3.encode(Mp3.Meta("fuzz title", "fuzz artist", 31000L,
      bitrateKbps = 192, sampleRate = 44100, nFrames = 3))
    val tiffRgb = Tiff.encode(6, 5, 3, 2,
      Array.tabulate(90)(i => (i * 7).toByte), little = true,
      rowsPerStrip = 2)
    val tiffGray = Tiff.encode(5, 7, 1, 1,
      Array.tabulate(35)(i => (i * 13).toByte), little = false,
      rowsPerStrip = 3)
    val rnd = new scala.util.Random(0xFA22)
    for ((base, dec) <- Seq[(Array[Byte], Array[Byte] => Option[Any])](
        (png, Png.decode), (palPng, Png.decode), (wav, Wav.decode),
        (jpg, Jpeg.decode), (colorJpg, Jpeg.decodeRgb),
        (gif, Gif.decode), (animGif, Gif.decodeFrames(_)),
        (animGif, Gif.animMeta(_)),
        (ppm, Netpbm.decode), (pgm16, Netpbm.decode),
        (mp3, Mp3.parse), (tiffRgb, Tiff.parse), (tiffGray, Tiff.parse),
        (Ico.encode(Seq(
          Ico.PngEntry(Png.encode(5, 4,
            Array.tabulate(60)(i => (i * 11).toByte), y => y % 5)),
          Ico.DibEntry(6, 5, Array.tabulate(90)(i => (i * 7).toByte),
            Array.tabulate(30)(i => i % 3 == 0)))),
          Ico.parse(_)))) {
      // every single-byte flip at every position, 4 flip values each
      for (pos <- base.indices; _ <- 1 to 4) {
        val m = base.clone()
        m(pos) = (m(pos) ^ (1 + rnd.nextInt(255))).toByte
        dec(m) // Some (benign byte) or None (rejected) — never throw
      }
      // truncation at every prefix length is likewise total
      for (n <- 0 until base.length) dec(base.take(n))
    }
    succeed
  }

  test("crafted adversarial inputs reject cleanly (valid CRCs, hostile fields)") {
    def patchPngChunk(png: Array[Byte], chunkStart: Int,
        edit: Array[Byte] => Unit): Array[Byte] = {
      // chunkStart points at the 4-byte length; recompute the CRC
      // over type+data after editing so only the FIELD is hostile
      val p = png.clone()
      edit(p)
      val len = ((p(chunkStart) & 0xFF) << 24) |
        ((p(chunkStart + 1) & 0xFF) << 16) |
        ((p(chunkStart + 2) & 0xFF) << 8) | (p(chunkStart + 3) & 0xFF)
      val crc = new java.util.zip.CRC32()
      crc.update(p, chunkStart + 4, 4 + len)
      val v = crc.getValue
      val at = chunkStart + 8 + len
      p(at) = ((v >> 24) & 0xFF).toByte; p(at + 1) = ((v >> 16) & 0xFF).toByte
      p(at + 2) = ((v >> 8) & 0xFF).toByte; p(at + 3) = (v & 0xFF).toByte
      p
    }
    val png = Png.encode(6, 5, Array.tabulate(90)(i => (i * 7).toByte),
      y => y % 5)
    // 1. IHDR declaring 2^30 x 2^30: must reject, not Int-overflow
    //    into a negative allocation (IHDR data starts at offset 16)
    val huge = patchPngChunk(png, 8, p => {
      p(16) = 0x40; p(17) = 0; p(18) = 0; p(19) = 0
      p(20) = 0x40; p(21) = 0; p(22) = 0; p(23) = 0
    })
    assert(Png.decode(huge).isEmpty)
    // 2. zlib FDICT flag in IDAT (CMF/FLG = 0x78 0x20, checksum
    //    valid): inflate stalls waiting for a dictionary — must
    //    reject, not loop forever (first IDAT follows the 25-byte
    //    IHDR chunk at offset 33; data begins at 41)
    val fdict = patchPngChunk(png, 33, p => {
      p(41) = 0x78; p(42) = 0x20
    })
    assert(Png.decode(fdict).isEmpty)
    // 3. JPEG SOF0 declaring 65535 x 65535 (valid u16 fields): the
    //    2^32-pixel allocation must reject, not overflow
    val jpg = Jpeg.encode(16, 8, Array.tabulate(128)(i => (i * 3).toByte))
    val sofAt = jpg.indices.find(i => (jpg(i) & 0xFF) == 0xFF &&
      (jpg(i + 1) & 0xFF) == 0xC0).get
    val hostile = jpg.clone()
    for (k <- 0 until 4) hostile(sofAt + 5 + k) = 0xFF.toByte
    assert(Jpeg.decode(hostile).isEmpty)
  }

  test("random images/clips round-trip the lossless codecs exactly") {
    val rnd = new scala.util.Random(0xC0DE)
    for (_ <- 1 to 120) {
      val w = 1 + rnd.nextInt(12); val h = 1 + rnd.nextInt(12)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val d = Png.decode(Png.encode(w, h, rgb, _ => rnd.nextInt(5)))
      assert(d.exists(x => x.width == w && x.height == h &&
        x.rgb.sameElements(rgb)))
    }
    for (_ <- 1 to 120) {
      val ch = 1 + rnd.nextInt(3); val frames = rnd.nextInt(41)
      val pcm = Array.fill(frames * ch)(rnd.nextInt(65536).toShort)
      val d = Wav.decode(Wav.encode(44100, ch, pcm))
      assert(d.exists(x => x.channels == ch &&
        x.samples.sameElements(pcm)))
    }
    // JPEG is lossy; its exactness class (constant even blocks) is
    // pinned in JpegSpec — here only totality on random valid input
    for (_ <- 1 to 40) {
      val w = 1 + rnd.nextInt(24); val h = 1 + rnd.nextInt(24)
      val gray = Array.fill(w * h)(rnd.nextInt(256).toByte)
      assert(Jpeg.decode(Jpeg.encode(w, h, gray))
        .exists(x => x.width == w && x.height == h))
    }
  }
}
