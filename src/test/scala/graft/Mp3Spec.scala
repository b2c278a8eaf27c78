package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Mp3

/** Roundtrip + frame-table + malformed-input tests for the MP3/ID3
  * metadata codec.
  */
class Mp3Spec extends AnyFunSuite {

  test("roundtrip across the bitrate and samplerate tables") {
    for (kbps <- Seq(32, 128, 192, 320); hz <- Seq(44100, 48000, 32000)) {
      val meta = Mp3.Meta("Some Title", "An Artist", 184000L,
        bitrateKbps = kbps, sampleRate = hz, nFrames = 4)
      assert(Mp3.parse(Mp3.encode(meta)).contains(meta),
        s"roundtrip failed at $kbps kbps / $hz Hz")
    }
  }

  test("frame lengths follow 144000·kbps/hz + padding") {
    // 128 kbps @ 44100: 417 unpadded / 418 padded; the encoder
    // alternates padding per frame, so 2 frames = 417 + 418 bytes
    // of audio after the tag.
    val meta = Mp3.Meta("t", "a", 1000L, 128, 44100, nFrames = 2)
    val bytes = Mp3.encode(meta)
    val tagSize = (bytes(6) << 21) | (bytes(7) << 14) |
      (bytes(8) << 7) | bytes(9)
    assert(bytes.length - (10 + tagSize) == 417 + 418)
    assert(Mp3.parse(bytes).exists(_.nFrames == 2))
  }

  test("ID3 wrinkles reject cleanly") {
    val base = Mp3.encode(Mp3.Meta("t", "a", 5000L, 192, 48000, 3))
    // v2.4 major version: unsupported
    val v24 = base.clone(); v24(3) = 4
    assert(Mp3.parse(v24).isEmpty)
    // synchsafe violation: high bit in a tag-size byte
    val ss = base.clone(); ss(6) = (ss(6) | 0x80).toByte
    assert(Mp3.parse(ss).isEmpty)
    // non-numeric TLEN: flip the digit region — find TLEN body
    val i = base.indexOfSlice("TLEN".getBytes("US-ASCII"))
    val bad = base.clone(); bad(i + 11) = 'x'.toByte
    assert(Mp3.parse(bad).isEmpty)
    // mid-stream header disagreeing (corrupt second frame's sync)
    assert(Mp3.parse(base.dropRight(1)).isEmpty) // chain must land exactly
  }

  test("missing tag or missing audio is None") {
    assert(Mp3.parse(Array[Byte](0xFF.toByte, 0xFB.toByte, 0x92.toByte, 0)).isEmpty)
    val meta = Mp3.Meta("t", "a", 5000L, 192, 48000, 1)
    val bytes = Mp3.encode(meta)
    val tagSize = (bytes(6) << 21) | (bytes(7) << 14) |
      (bytes(8) << 7) | bytes(9)
    assert(Mp3.parse(bytes.take(10 + tagSize)).isEmpty) // tag only
  }
}
