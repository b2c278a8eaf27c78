package graft

import graft.multimodal.{Ico, Png}

/** The ICO container's value is its directory + dual-format wrinkles
  * — bounds-checked offsets, PNG-vs-DIB sniffing, the doubled
  * biHeight XOR+AND block with independent row strides, MSB-first
  * mask bits, 0-means-256 directory dims — exercised here
  * independently of the m33 planting formulas.
  */
class IcoSpec extends SparkSpec {

  private def rgb(w: Int, h: Int)(f: (Int, Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val c = i % 3; val x = (i / 3) % w; val y = i / 3 / w
      f(y, x, c).toByte
    }

  test("mixed PNG + DIB container round-trips every per-icon stat") {
    val pngPix = rgb(5, 4)((y, x, c) => y * 41 + x * 17 + c * 5)
    val dibPix = rgb(7, 6)((y, x, c) => y * 23 + x * 13 + c * 7)
    // Mask with a set bit past column 8 so the second mask byte and
    // the MSB-first order both matter (w = 7 < 8 would hide them) —
    // and w = 7 forces XOR row padding (21 -> 24) too.
    val mask = Array.tabulate(7 * 6)(i => i % 5 == 0)
    val ico = Ico.encode(Seq(
      Ico.PngEntry(Png.encode(5, 4, pngPix, y => y % 5)),
      Ico.DibEntry(7, 6, dibPix, mask)))
    val metas = Ico.parse(ico).getOrElse(fail("did not parse"))
    assert(metas.length == 2)
    val p = metas.head
    assert(p.idx == 0 && p.width == 5 && p.height == 4)
    assert(p.isPng && p.bitCount == 0 && p.maskBits == 0L)
    assert(p.sumRgb == pngPix.map(_ & 0xFF).map(_.toLong).sum)
    val d = metas(1)
    assert(d.idx == 1 && d.width == 7 && d.height == 6)
    assert(!d.isPng && d.bitCount == 24)
    assert(d.sumRgb == dibPix.map(_ & 0xFF).map(_.toLong).sum)
    assert(d.maskBits == mask.count(identity).toLong)
  }

  test("malformed containers reject cleanly; bad entries drop") {
    assert(Ico.parse(Array[Byte]()).isEmpty)
    assert(Ico.parse(Array[Byte](0, 0, 2, 0, 1, 0)).isEmpty) // type 2
    // Directory promises 2 entries but the bytes end early.
    assert(Ico.parse(Array[Byte](0, 0, 1, 0, 2, 0, 0, 0)).isEmpty)
    // A valid container whose single entry points past the payload:
    // the entry drops, the container still parses.
    val good = Ico.encode(Seq(Ico.DibEntry(4, 4,
      rgb(4, 4)((y, x, c) => y + x + c), Array.fill(16)(false))))
    val hostile = good.clone()
    hostile(6 + 12) = 0x7F // entry 0's offset low byte -> far away
    val metas = Ico.parse(hostile)
    assert(metas.isDefined && metas.get.isEmpty)
    // Non-24-bit / compressed DIB entries drop rather than misparse.
    val odd = good.clone()
    odd(6 + 16 + 14) = 8 // biBitCount inside the DIB header
    assert(Ico.parse(odd).get.isEmpty)
  }

  test("0-means-256 directory byte and mask stride at width 33") {
    // Width 33 needs 5 mask bytes per row padded to 8 (64 bits) and
    // a 3-byte XOR pad; one set bit in the last mask column pins the
    // stride math exactly.
    val w = 33; val h = 3
    val mask = Array.tabulate(w * h)(i => i == (w * h - 1))
    val ico = Ico.encode(Seq(Ico.DibEntry(w, h,
      rgb(w, h)((y, x, c) => y * 3 + x * 5 + c), mask)))
    val m = Ico.parse(ico).get.head
    assert(m.width == 33 && m.height == 3 && m.maskBits == 1L)
  }
}
