package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Gif

/** Round-trip and malformed-input semantics for the pure-JVM GIF
  * codec (no Spark session needed — the codec is plain code).
  */
class GifSpec extends AnyFunSuite {

  private def plant(id: Long): (Int, Int, Int, Array[Byte], Array[Byte]) = {
    val w = (4 + id % 5).toInt
    val h = (4 + (id * 3) % 5).toInt
    val depth = Array(8, 4, 2, 1)((id % 4).toInt)
    val psize = math.min(16, 1 << depth)
    val palette = Array.tabulate(3 << depth) { i =>
      val j = i / 3; val c = i % 3
      ((id * 43 + j * 31 + c * 17) % 256).toByte
    }
    val indices = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      ((id * 19 + y * 11 + x * 7) % psize).toByte
    }
    (w, h, depth, palette, indices)
  }

  test("round-trip: every planted layout decodes to the exact pixels") {
    for (id <- 0L until 40L) {
      val (w, h, depth, palette, indices) = plant(id)
      val bytes = Gif.encode(w, h, depth, palette, indices,
        interlaced = id % 2 == 1)
      val d = Gif.decode(bytes)
      assert(d.isDefined, s"id=$id depth=$depth ${w}x$h failed to decode")
      assert(d.get.width == w && d.get.height == h, s"id=$id dims")
      val want = indices.flatMap { ix =>
        val j = (ix & 0xFF) * 3
        Array(palette(j), palette(j + 1), palette(j + 2))
      }
      assert(d.get.rgb.toSeq == want.toSeq, s"id=$id pixels")
    }
  }

  test("long stream exercises width growth and a dictionary reset") {
    // 8k pixels of a varied pattern pushes the dictionary through
    // several width changes (and with depth 8, codes reach past 512)
    val w = 128; val h = 64
    val depth = 8
    val palette = Array.tabulate(3 << depth)(i => (i * 7 % 256).toByte)
    val indices = Array.tabulate(w * h) { i =>
      ((i * 31 + (i / w) * 17 + (i * i % 251)) % 256).toByte
    }
    val d = Gif.decode(Gif.encode(w, h, depth, palette, indices))
    assert(d.isDefined)
    val want = indices.flatMap { ix =>
      val j = (ix & 0xFF) * 3
      Array(palette(j), palette(j + 1), palette(j + 2))
    }
    assert(d.get.rgb.toSeq == want.toSeq)
  }

  test("local color table and extension blocks: hand-built stream decodes") {
    // The planting encoder only writes GLOBAL tables; real crawls
    // carry local tables and GCE/comment extensions. Build a stream
    // by hand: take an encoded GIF, strip its GCT, and re-home the
    // palette as a LOCAL table behind a graphic-control extension.
    val (w, h, depth) = (5, 4, 2)
    val palette = Array.tabulate(3 << depth)(i => (i * 23).toByte)
    val indices = Array.tabulate[Byte](w * h)(i => (i % (1 << depth)).toByte)
    val full = Gif.encode(w, h, depth, palette, indices)
    val gctLen = 3 << depth
    // layout: 6 header + 7 LSD + gct + rest(image descriptor...)
    val lsd = full.slice(6, 13)
    lsd(4) = (lsd(4) & 0x7F).toByte // clear the GCT flag
    val rest = full.drop(13 + gctLen)
    // graphic control extension: introducer, label, size 4, flags,
    // delay(2), transparent idx, terminator
    val gce = Array(0x21, 0xF9, 4, 0, 0, 0, 0, 0).map(_.toByte)
    // image descriptor with the LOCAL color table flag + size bits
    val desc = rest.take(10).clone()
    desc(9) = (0x80 | (depth - 1)).toByte
    val bytes = full.take(6) ++ lsd ++ gce ++ desc ++ palette ++
      rest.drop(10)
    val d = Gif.decode(bytes)
    assert(d.isDefined, "LCT + GCE stream must decode")
    val want = indices.flatMap { ix =>
      val j = (ix & 0xFF) * 3
      Array(palette(j), palette(j + 1), palette(j + 2))
    }
    assert(d.get.rgb.toSeq == want.toSeq)
    // no table anywhere -> clean reject
    val noTables = full.take(6) ++ lsd ++ rest
    assert(Gif.decode(noTables).isEmpty)
  }

  test("malformed inputs reject cleanly") {
    val (w, h, depth, palette, indices) = plant(3L)
    val good = Gif.encode(w, h, depth, palette, indices)
    assert(Gif.decode(Array.empty[Byte]).isEmpty)
    assert(Gif.decode("NOTAGIF".getBytes("US-ASCII")).isEmpty)
    assert(Gif.decode(good.take(10)).isEmpty, "truncated header")
    assert(Gif.decode(good.dropRight(5)).isEmpty, "truncated data")
    // flip a byte inside the LZW stream: must reject or decode —
    // never throw (totality); most flips corrupt the code stream
    for (i <- 20 until math.min(good.length, 60)) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x5A).toByte
      Gif.decode(bad) // must not throw
    }
  }
}
