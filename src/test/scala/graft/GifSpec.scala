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

  /** Independent reference compositor for the animated frame walk:
    * plain nested loops over the spec'd semantics (paint non-
    * transparent indices at the frame offset; disposal 1 leaves,
    * 2 restores the rect to background, 3 restores the pre-frame
    * canvas), so the decoder's walk is checked against a second
    * implementation, not itself.
    */
  private def composite(w: Int, h: Int, palette: Array[Byte], bg: Int,
      frames: Seq[Gif.FrameSpec]): Seq[Array[Byte]] = {
    val canvas = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h)
      System.arraycopy(palette, bg * 3, canvas, i * 3, 3)
    val out = Seq.newBuilder[Array[Byte]]
    for (f <- frames) {
      val before = canvas.clone()
      for (v <- 0 until f.height; u <- 0 until f.width) {
        val ix = f.indices(v * f.width + u) & 0xFF
        if (ix != f.transparent)
          System.arraycopy(palette, ix * 3, canvas,
            ((f.top + v) * w + (f.left + u)) * 3, 3)
      }
      out += canvas.clone()
      f.disposal match {
        case 2 =>
          for (v <- 0 until f.height; u <- 0 until f.width)
            System.arraycopy(palette, bg * 3, canvas,
              ((f.top + v) * w + (f.left + u)) * 3, 3)
        case 3 =>
          System.arraycopy(before, 0, canvas, 0, canvas.length)
        case _ => ()
      }
    }
    out.result()
  }

  test("animated: frame walk composites offsets, transparency, and every disposal mode") {
    for (id <- 0L until 24L) {
      val w = (8 + id % 5).toInt
      val h = (8 + (id * 3) % 5).toInt
      val psize = 16
      val palette = Array.tabulate(3 * psize) { i =>
        ((id * 47 + (i / 3) * 29 + (i % 3) * 13) % 256).toByte
      }
      val base = Gif.FrameSpec(0, 0, w, h,
        Array.tabulate(w * h)(i =>
          ((id * 19 + (i / w) * 11 + (i % w) * 7) % psize).toByte),
        disposal = 1, interlaced = id % 2 == 1)
      // three sub-rect frames cycling disposal 2 → 3 → 1, each with
      // a live transparent index
      val rest = (1 to 3).map { k =>
        Gif.FrameSpec(
          ((id + 3 * k) % (w - 3)).toInt, ((id * 5 + 7 * k) % (h - 3)).toInt,
          4, 4,
          Array.tabulate(16)(i =>
            ((id * 3 + k * 23 + (i / 4) * 5 + (i % 4) * 9) % psize).toByte),
          disposal = Seq(2, 3, 1)(k - 1),
          transparent = ((id + 5 * k) % psize).toInt,
          interlaced = (id + k) % 2 == 0)
      }
      val frames = base +: rest
      val bytes = Gif.encodeAnimated(w, h, 4, palette, frames)
      val got = Gif.decodeFrames(bytes)
      assert(got.isDefined, s"id=$id failed to decode")
      assert(got.get.length == 4, s"id=$id frame count")
      val want = composite(w, h, palette, bg = 0, frames)
      for (f <- 0 until 4) {
        assert(got.get(f).width == w && got.get(f).height == h,
          s"id=$id frame $f dims")
        assert(got.get(f).rgb.toSeq == want(f).toSeq,
          s"id=$id frame $f pixels")
      }
    }
  }

  test("animated: single full-canvas frame matches the single-frame decoder") {
    val (w, h, depth, palette, indices) = plant(7L)
    val single = Gif.decode(Gif.encode(w, h, depth, palette, indices)).get
    val anim = Gif.decodeFrames(Gif.encodeAnimated(w, h, depth, palette,
      Seq(Gif.FrameSpec(0, 0, w, h, indices)))).get
    assert(anim.length == 1)
    assert(anim.head.rgb.toSeq == single.rgb.toSeq)
    // decodeFrames also walks plain single-image GIFs (no GCE)
    val plain = Gif.decodeFrames(Gif.encode(w, h, depth, palette, indices)).get
    assert(plain.length == 1 && plain.head.rgb.toSeq == single.rgb.toSeq)
  }

  test("end-of-stream leniency: missing trailer/EOI accepted iff the frame filled") {
    val (w, h, depth, palette, indices) = plant(5L)
    val anim = Gif.encodeAnimated(w, h, depth, palette,
      Seq(Gif.FrameSpec(0, 0, w, h, indices)))
    // dropping the 0x3B trailer: clean end of stream after a full frame
    assert(anim.last == 0x3B.toByte)
    assert(Gif.decodeFrames(anim.dropRight(1)).exists(_.length == 1))
    // hand-built 1x1 whose LZW stream ends WITHOUT an EOI code:
    // codes (width 3) are clear=4 then index 0 — one byte 0x04
    val noEoi = (Seq[Int]('G', 'I', 'F', '8', '9', 'a',
      1, 0, 1, 0,            // 1x1 canvas
      0x80 | (1 << 4) | 1,   // GCT flag, 4 entries
      0, 0) ++               // bg index, aspect
      Seq.fill(12)(0x42) ++  // 4-entry palette
      Seq(0x2C, 0, 0, 0, 0, 1, 0, 1, 0, 0, // descriptor, 1x1
        2,                   // min code size
        1, 0x04,             // one sub-block: [clear, 0]
        0, 0x3B)).map(_.toByte).toArray
    assert(Gif.decode(noEoi).exists(_.rgb.toSeq ==
      Seq[Byte](0x42, 0x42, 0x42)))
    // same stream but one pixel SHORT (2x1 frame, one emitted
    // index): under-filled frames still reject
    val short = (Seq[Int]('G', 'I', 'F', '8', '9', 'a',
      2, 0, 1, 0, 0x80 | (1 << 4) | 1, 0, 0) ++
      Seq.fill(12)(0x42) ++
      Seq(0x2C, 0, 0, 0, 0, 2, 0, 1, 0, 0, 2, 1, 0x04, 0, 0x3B))
      .map(_.toByte).toArray
    assert(Gif.decode(short).isEmpty,
      "under-filled frame must still reject")
  }

  test("transparent pixels past a truncated color table still decode") {
    // Real-crawl GIFs (sloppy encoders) legally carry TRANSPARENT
    // pixels whose index exceeds a small color table — transparent
    // pixels are never rendered, so the palette bound must not apply
    // to them. Craft one: encode depth 3 (8-entry table) with
    // index-7 pixels transparent, then SHRINK the global table to 4
    // entries (LSD size field + 12 dropped bytes). Index 7 now
    // exceeds the table but only ever appears transparent.
    val (w, h) = (4, 3)
    val palette8 = Array.tabulate(24)(i => (i * 23).toByte)
    val indices = Array.tabulate[Byte](w * h)(i =>
      if (i % 3 == 0) 7 else (i % 4).toByte)
    val anim = Gif.encodeAnimated(w, h, 3, palette8,
      Seq(Gif.FrameSpec(0, 0, w, h, indices, transparent = 7)))
    assert(Gif.decodeFrames(anim).exists(_.length == 1)) // sanity
    // LSD packed: GCT flag + color-res + size field 2 (8 entries) →
    // size field 1 (4 entries); drop the table's last 12 bytes
    assert((anim(10) & 0xFF) == (0x80 | (2 << 4) | 2))
    val patched = (anim.take(10) :+ (0x80 | (1 << 4) | 1).toByte) ++
      anim.slice(11, 13) ++ anim.slice(13, 25) ++ anim.drop(37)
    val got = Gif.decodeFrames(patched)
    assert(got.exists(_.length == 1),
      "out-of-table transparent pixels must not reject the GIF")
    // the rendered (non-transparent) pixels still match the palette;
    // transparent spots show the background (palette entry 0)
    val rgb = got.get.head.rgb
    for (i <- 0 until w * h; c <- 0 until 3) {
      val want = if (i % 3 == 0) palette8(c)
        else palette8((i % 4) * 3 + c)
      assert(rgb(i * 3 + c) == want, s"pixel $i channel $c")
    }
  }

  test("animMeta reads frame count/delays/loop without inflating LZW") {
    val (w, h, depth, palette, indices) = plant(9L)
    val frames = Seq(
      Gif.FrameSpec(0, 0, w, h, indices, delayCs = 10),
      Gif.FrameSpec(1, 1, 2, 2, Array[Byte](0, 1, 1, 0), delayCs = 25,
        transparent = 1, disposal = 2))
    val anim = Gif.encodeAnimated(w, h, depth, palette, frames)
    val m = Gif.animMeta(anim)
    assert(m.contains(Gif.AnimMeta(w, h, 2, 35, looped = true)))
    // plain single-image GIFs (no GCE, no NETSCAPE): 1 frame, 0 delay
    val plain = Gif.animMeta(Gif.encode(w, h, depth, palette, indices))
    assert(plain.contains(Gif.AnimMeta(w, h, 1, 0, looped = false)))
    // CORRUPT LZW data must not matter — metadata never inflates it:
    // flip every byte of the last frame's code stream
    val broken = anim.clone()
    for (i <- anim.length - 12 until anim.length - 2)
      broken(i) = (broken(i) ^ 0x55).toByte
    // (may clobber sub-block framing → clean None; a decode-coupled
    // implementation would instead throw or hang)
    Gif.animMeta(broken)
    assert(Gif.animMeta(anim.take(15)).isEmpty, "truncated header")
    assert(Gif.animMeta(Array.empty[Byte]).isEmpty)
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
