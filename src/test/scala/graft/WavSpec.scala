package graft

import graft.multimodal.Wav

/** The WAV codec decodes real RIFF structure (chunk walk, fmt
  * validation, word-alignment padding, PCM extraction), so its spec
  * exercises each edge independently of the planted-clip formula the
  * m8 oracle pins.
  */
class WavSpec extends SparkSpec {

  private def pcm(n: Int)(f: Int => Int): Array[Short] =
    Array.tabulate(n)(i => f(i).toShort)

  test("round-trips stereo 16-bit PCM through the RIFF container") {
    val samples = pcm(64)(i => (i * 1021 - 17000) % 32768)
    val d = Wav.decode(Wav.encode(44100, 2, samples))
      .getOrElse(fail("did not decode"))
    assert(d.sampleRate == 44100 && d.channels == 2)
    assert(d.samples.sameElements(samples))
  }

  test("skips the odd-length ancillary chunk with word alignment") {
    // the encoder always plants a 9-byte LIST chunk; a decoder that
    // forgets the pad byte desyncs and never finds "data"
    val p = Wav.encode(8000, 1, pcm(3)(i => i - 1))
    val listAt = p.sliding(4).indexWhere(_.sameElements("LIST".getBytes))
    assert(listAt > 0, "planted clips must carry the ancillary chunk")
    val d = Wav.decode(p).get
    assert(d.samples.toSeq == Seq[Short](-1, 0, 1))
  }

  test("extreme sample values survive the LE round-trip") {
    val samples = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1)
    // 5 frames x 1 channel
    val d = Wav.decode(Wav.encode(16000, 1, samples)).get
    assert(d.samples.sameElements(samples))
  }

  test("rejects malformed and unsupported payloads") {
    val good = Wav.encode(8000, 1, pcm(4)(identity))
    assert(Wav.decode(good).isDefined)
    assert(Wav.decode(good.take(good.length - 3)).isEmpty, "truncated data")
    assert(Wav.decode(good.drop(1)).isEmpty, "bad magic")
    assert(Wav.decode(Array.emptyByteArray).isEmpty)
    val nonPcm = good.clone()
    val fmtAt = nonPcm.sliding(4).indexWhere(_.sameElements("fmt ".getBytes))
    nonPcm(fmtAt + 8) = 3 // IEEE float format tag
    assert(Wav.decode(nonPcm).isEmpty, "non-PCM format tag")
    val badAlign = good.clone()
    badAlign(fmtAt + 8 + 12) = 5 // blockAlign != channels*2
    assert(Wav.decode(badAlign).isEmpty, "inconsistent blockAlign")
  }
}
