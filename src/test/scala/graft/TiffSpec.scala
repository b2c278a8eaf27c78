package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Tiff

/** Roundtrip + layout tests for the strip TIFF codec. */
class TiffSpec extends AnyFunSuite {

  private def px(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + 7) % 256).toByte)

  test("roundtrip: both endians x gray/RGB x strip layouts") {
    for (little <- Seq(true, false); spp <- Seq(1, 3);
        rps <- Seq(1, 2, 7, 100)) {
      val (w, h) = (5, 7)
      val photometric = if (spp == 3) 2 else 1
      val pixels = px(w * h * spp)
      val enc = Tiff.encode(w, h, spp, photometric, pixels,
        little, rps)
      val got = Tiff.parse(enc)
      assert(got.isDefined, s"little=$little spp=$spp rps=$rps")
      val d = got.get
      assert(d.width == w && d.height == h &&
        d.samplesPerPixel == spp && d.photometric == photometric)
      assert(d.nStrips == (h + rps - 1) / rps)
      assert(d.pixels.toSeq == pixels.toSeq)
    }
  }

  test("multi-strip files use offset-indirected arrays; single strip inlines") {
    // 7 rows / 2 per strip = 4 strips -> StripOffsets count 4 (> 1
    // LONG) must be stored out of line; rps=100 -> 1 strip, inline.
    val multi = Tiff.encode(5, 7, 1, 0, px(35), little = true,
      rowsPerStrip = 2)
    val single = Tiff.encode(5, 7, 1, 0, px(35), little = true,
      rowsPerStrip = 100)
    assert(multi.length > single.length)
    assert(Tiff.parse(multi).get.nStrips == 4)
    assert(Tiff.parse(single).get.nStrips == 1)
    assert(Tiff.parse(multi).get.pixels.toSeq ==
      Tiff.parse(single).get.pixels.toSeq)
  }

  test("hostile headers reject cleanly") {
    val base = Tiff.encode(5, 7, 1, 1, px(35), little = true,
      rowsPerStrip = 2)
    // compression != 1: entry 4 (0-indexed 3) is Compression; its
    // value slot is at ifd(8) + 2 + 3*12 + 8
    val comp = base.clone(); comp(8 + 2 + 3 * 12 + 8) = 5
    assert(Tiff.parse(comp).isEmpty)
    // width 2^30 (allocation guard): entry 0's LONG value slot
    val wide = base.clone()
    wide(8 + 2 + 8) = 0; wide(8 + 2 + 9) = 0
    wide(8 + 2 + 10) = 0; wide(8 + 2 + 11) = 0x40
    assert(Tiff.parse(wide).isEmpty)
    // truncation at every prefix is total
    for (n <- 0 until base.length) Tiff.parse(base.take(n))
    succeed
  }
}
