package graft.multimodal

/** Pure-JVM MP3 METADATA codec: an ID3v2.3 tag walk plus an MPEG
  * audio frame-header parse — the catalogue pass an audio crawl runs
  * over every payload WITHOUT decoding audio (the sibling of
  * [[Exif]]'s TIFF-IFD walk on the image side). The parsing wrinkles
  * are the real ones: ID3v2 sizes are SYNCHSAFE (4×7 bits — a high
  * bit set anywhere is malformed), v2.3 frame sizes are plain 32-bit
  * big-endian (different from the tag size!), text frames carry an
  * encoding byte, and the audio stream after the tag is a chain of
  * self-describing frames whose lengths come from the version/layer/
  * bitrate/samplerate header tables
  * (len = 144000·kbps/hz + padding for MPEG-1 Layer III).
  *
  * Encoder + decoder both live here so planted corpora are real
  * format bytes walked by a real tag machine (the m30 protocol).
  * Both are total: [[parse]] returns None on anything malformed,
  * never throws (CodecFuzzSpec).
  *
  * Format reference: the public ID3v2.3 informal standard and
  * ISO/IEC 11172-3 frame-header layout; the reference repo has no
  * audio handling.
  */
object Mp3 {

  final case class Meta(title: String, artist: String, tlenMs: Long,
      bitrateKbps: Int, sampleRate: Int, nFrames: Int)

  /** MPEG-1 Layer III bitrate table, index 1-14 (0 = free, 15 = bad). */
  private val Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320)

  /** MPEG-1 samplerate table, index 0-2 (3 = reserved). */
  private val SampleRates = Array(44100, 48000, 32000)

  private def frameLen(kbps: Int, hz: Int, padding: Int): Int =
    144000 * kbps / hz + padding

  /** ID3v2.3 tag (TIT2/TPE1/TLEN text frames) followed by `nFrames`
    * MPEG-1 Layer III frames with deterministic filler payloads.
    */
  def encode(meta: Meta): Array[Byte] = {
    val bi = Bitrates.indexOf(meta.bitrateKbps)
    val si = SampleRates.indexOf(meta.sampleRate)
    require(bi >= 1, s"unsupported bitrate ${meta.bitrateKbps}")
    require(si >= 0, s"unsupported samplerate ${meta.sampleRate}")
    require(meta.nFrames >= 1, "at least one audio frame")
    // Encode's domain must equal parse's acceptance set (the
    // Tiff/Exif guard discipline), or a planted row silently
    // disappears on the read side: parse caps TLEN at 15 digits and
    // reads text as ISO-8859-1 (getBytes would lossily substitute
    // '?' for anything outside Latin-1, breaking the roundtrip).
    require(meta.tlenMs >= 0 && meta.tlenMs < 1000000000000000L,
      "TLEN must be 0 <= ms < 10^15")
    require((meta.title + meta.artist).forall(_ <= 'ÿ'),
      "title/artist must be ISO-8859-1-encodable")

    def textFrame(id: String, text: String): Array[Byte] = {
      val body = 0.toByte +: text.getBytes("ISO-8859-1")
      val sz = body.length
      id.getBytes("US-ASCII") ++ Array[Byte](
        ((sz >> 24) & 0xFF).toByte, ((sz >> 16) & 0xFF).toByte,
        ((sz >> 8) & 0xFF).toByte, (sz & 0xFF).toByte, 0, 0) ++ body
    }
    val frames = textFrame("TIT2", meta.title) ++
      textFrame("TPE1", meta.artist) ++
      textFrame("TLEN", meta.tlenMs.toString)
    val tagSize = frames.length
    require(tagSize < (1 << 28), "tag too long for synchsafe size")
    val header = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0,
      ((tagSize >> 21) & 0x7F).toByte, ((tagSize >> 14) & 0x7F).toByte,
      ((tagSize >> 7) & 0x7F).toByte, (tagSize & 0x7F).toByte)

    val audio = (0 until meta.nFrames).flatMap { f =>
      val padding = f % 2 // exercise both padded and unpadded lengths
      val len = frameLen(meta.bitrateKbps, meta.sampleRate, padding)
      val h = Array[Byte](0xFF.toByte,
        0xFB.toByte, // 111 11011: MPEG-1, Layer III, no CRC
        (((bi & 0xF) << 4) | ((si & 0x3) << 2) | (padding << 1)).toByte,
        0x00) // stereo, no mode extension
      h ++ Array.tabulate(len - 4)(i => ((f * 31 + i * 7) % 256).toByte)
    }.toArray
    header ++ frames ++ audio
  }

  /** Walk the ID3v2.3 tag for TIT2/TPE1/TLEN, then the MPEG frame
    * chain for (bitrate, samplerate, frame count). None on anything
    * malformed: missing/NOT-v2.3 tag, non-synchsafe tag size, frame
    * running past the tag, bad text encoding, unparsable TLEN,
    * missing or reserved audio header fields, a frame chain that
    * does not cover the remaining bytes exactly, or a mid-stream
    * header disagreeing with the first.
    */
  def parse(bytes: Array[Byte]): Option[Meta] = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return None
    if (bytes(3) != 3 || bytes(4) != 0) return None // v2.3 only
    if ((bytes(5) & 0xFF) != 0) return None // no unsynchronisation etc.
    var i = 6
    var tagSize = 0
    while (i < 10) {
      val b = bytes(i) & 0xFF
      if ((b & 0x80) != 0) return None // synchsafe violation
      tagSize = (tagSize << 7) | b
      i += 1
    }
    val tagEnd = 10 + tagSize
    if (tagEnd > bytes.length) return None

    var title: String = null
    var artist: String = null
    var tlen = -1L
    var p = 10
    var done = false
    while (!done && p + 10 <= tagEnd) {
      if (bytes(p) == 0) done = true // padding region
      else {
        val id = new String(bytes, p, 4, "US-ASCII")
        if (!id.forall(c => (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9'))) return None
        val sz = ((bytes(p + 4) & 0xFF) << 24) |
          ((bytes(p + 5) & 0xFF) << 16) |
          ((bytes(p + 6) & 0xFF) << 8) | (bytes(p + 7) & 0xFF)
        // Overflow-safe bound: `p + 10 + sz > tagEnd` wraps negative
        // for sz near Int.MaxValue and would accept the frame, then
        // index out of bounds — compare against the remaining room
        // instead (loop guard ensures tagEnd - 10 - p >= 0).
        if (sz < 0 || sz > tagEnd - 10 - p) return None
        id match {
          case "TIT2" | "TPE1" | "TLEN" =>
            if (sz < 1 || bytes(p + 10) != 0) return None // ISO-8859-1 only
            val text = new String(bytes, p + 11, sz - 1, "ISO-8859-1")
            id match {
              case "TIT2" => title = text
              case "TPE1" => artist = text
              case _ =>
                if (text.isEmpty || !text.forall(_.isDigit) ||
                  text.length > 15) return None
                tlen = text.toLong
            }
          case _ => // unknown frame: skip
        }
        p += 10 + sz
      }
    }
    if (title == null || artist == null || tlen < 0) return None

    // Audio frame chain: first header fixes (bitrate, samplerate);
    // every subsequent frame must agree and the chain must land
    // exactly on the end of the payload.
    var q = tagEnd
    if (q + 4 > bytes.length) return None
    var kbps = -1
    var hz = -1
    var n = 0
    while (q + 4 <= bytes.length) {
      if ((bytes(q) & 0xFF) != 0xFF || (bytes(q + 1) & 0xFF) != 0xFB)
        return None
      val b2 = bytes(q + 2) & 0xFF
      val bi = (b2 >> 4) & 0xF
      val si = (b2 >> 2) & 0x3
      val padding = (b2 >> 1) & 0x1
      if (bi < 1 || bi > 14 || si > 2) return None
      val k = Bitrates(bi)
      val h = SampleRates(si)
      if (kbps < 0) { kbps = k; hz = h }
      else if (k != kbps || h != hz) return None
      val len = frameLen(k, h, padding)
      if (q + len > bytes.length) return None
      q += len
      n += 1
    }
    if (q != bytes.length || n < 1) return None
    Some(Meta(title, artist, tlen, kbps, hz, n))
  }
}
