package graft.multimodal

/** A real (minimal) WAV codec — pure JVM, no audio libraries.
  *
  * The ENCODER exists to plant test clips; the DECODER is the
  * capability: it decodes any RIFF/WAVE container carrying 16-bit PCM
  * — RIFF header validation, chunk walk with odd-size word-alignment
  * padding (RIFF spec), unknown-chunk skip (LIST/cue/fact/...), `fmt `
  * field parsing with blockAlign/byteRate consistency checks, and
  * little-endian sample extraction. Together with [[Png]] this makes
  * the multimodal family decode real container structure for both an
  * image and an audio format.
  */
object Wav {

  case class Decoded(sampleRate: Int, channels: Int,
      samples: Array[Short])

  private def u2(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
  private def u4(p: Array[Byte], i: Int): Long =
    (u2(p, i).toLong) | (u2(p, i + 2).toLong << 16)

  /** Encode interleaved 16-bit PCM as RIFF/WAVE. Always plants one
    * odd-length ancillary `LIST` chunk between `fmt ` and `data` so
    * every planted clip exercises the decoder's skip-and-pad path.
    */
  def encode(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && channels <= 0xFFFF,
      "fmt carries rate as u32 and channels as u16")
    require(samples.length % channels == 0,
      "samples must be whole interleaved frames")
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le2(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le4(v: Long): Unit = { le2((v & 0xFFFF).toInt); le2(((v >> 16) & 0xFFFF).toInt) }
    val list = "INFOgraft".getBytes("US-ASCII") // 9 bytes: odd, needs pad
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + list.length + 1) + (8 + dataLen)
    ascii("RIFF"); le4(riffLen.toLong); ascii("WAVE")
    ascii("fmt "); le4(16L)
    le2(1) // PCM
    le2(channels)
    le4(sampleRate.toLong)
    le4(sampleRate.toLong * channels * 2) // byte rate
    le2(channels * 2) // block align
    le2(16) // bits per sample
    ascii("LIST"); le4(list.length.toLong); out.write(list); out.write(0) // pad
    ascii("data"); le4(dataLen.toLong)
    samples.foreach(s => le2(s & 0xFFFF))
    out.toByteArray
  }

  /** Decode a 16-bit PCM RIFF/WAVE clip. Returns None for anything
    * malformed or outside the supported subset: bad RIFF/WAVE magic,
    * missing or short `fmt `, non-PCM format tag, bits != 16,
    * inconsistent blockAlign/byteRate, truncated chunks, or a data
    * length that is not whole frames.
    */
  def decode(p: Array[Byte]): Option[Decoded] = {
    if (p.length < 12) return None
    def tag(i: Int, s: String): Boolean =
      new String(p, i, 4, "US-ASCII") == s
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    val riffEnd = 8L + u4(p, 4)
    if (riffEnd > p.length) return None
    var off = 12
    var sampleRate = -1; var channels = -1
    var sawFmt = false
    var samples: Array[Short] = null
    while (off + 8 <= riffEnd) {
      val tpe = new String(p, off, 4, "US-ASCII")
      val len = u4(p, off + 4)
      if (len > Int.MaxValue - 8 || off + 8 + len > riffEnd) return None
      tpe match {
        case "fmt " =>
          if (len < 16) return None
          val b = off + 8
          if (u2(p, b) != 1) return None // PCM only
          channels = u2(p, b + 2)
          sampleRate = u4(p, b + 4).toInt
          val byteRate = u4(p, b + 8)
          val blockAlign = u2(p, b + 12)
          if (u2(p, b + 14) != 16) return None // 16-bit only
          if (channels <= 0 || sampleRate <= 0) return None
          if (blockAlign != channels * 2) return None
          if (byteRate != sampleRate.toLong * channels * 2) return None
          sawFmt = true
        case "data" =>
          if (!sawFmt) return None // fmt must precede data
          if (len % (channels * 2) != 0) return None
          val n = (len / 2).toInt
          val arr = new Array[Short](n)
          var i = 0
          while (i < n) {
            arr(i) = u2(p, off + 8 + i * 2).toShort
            i += 1
          }
          samples = arr
        case _ => () // ancillary chunk (LIST/cue/fact/...) skipped
      }
      off += 8 + len.toInt + (len.toInt & 1) // RIFF word alignment
    }
    if (!sawFmt || samples == null) None
    else Some(Decoded(sampleRate, channels, samples))
  }
}
