package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Exif, Jpeg}

/** Roundtrip + endianness + storage-path tests for the EXIF codec. */
class ExifSpec extends AnyFunSuite {

  private val jpeg =
    Jpeg.encode(16, 8, Array.tabulate(128)(i => (i * 3).toByte))

  test("roundtrip both byte orders through a real JPEG stream") {
    for (order <- Seq("II", "MM")) {
      val meta = Exif.Meta(order, orientation = 6, width = 123L,
        height = 77L, dateTime = "2019:05:04 03:02:01",
        make = "camera-x")
      val got = Exif.parse(Exif.encodeInto(jpeg, meta))
      assert(got.contains(meta))
    }
  }

  test("inline (<=4 byte) and offset ASCII storage both parse") {
    val short = Exif.Meta("II", 1, 10L, 20L,
      "2001:01:01 00:00:00", "ab") // 3 bytes with NUL: inline
    val long = Exif.Meta("MM", 1, 10L, 20L,
      "2001:01:01 00:00:00", "abcdefgh") // offset path
    assert(Exif.parse(Exif.encodeInto(jpeg, short)).contains(short))
    assert(Exif.parse(Exif.encodeInto(jpeg, long)).contains(long))
  }

  test("plain JPEG without APP1 parses to None; EOI stops the walk") {
    assert(Exif.parse(jpeg).isEmpty)
  }

  test("corruption and truncation are total") {
    val meta = Exif.Meta("II", 3, 55L, 44L,
      "2010:10:10 10:10:10", "fuzzcam")
    val base = Exif.encodeInto(jpeg, meta)
    val rnd = new scala.util.Random(0xE81F)
    for (pos <- base.indices; _ <- 1 to 2) {
      val m = base.clone()
      m(pos) = (m(pos) ^ (1 + rnd.nextInt(255))).toByte
      Exif.parse(m) // never throws
    }
    for (n <- 0 until base.length) Exif.parse(base.take(n))
    succeed
  }
}
