package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record source — the Common-Crawl-style web
  * archive format a crawl-fed training pipeline ingests.
  *
  * Scale shape: WARC records are Content-Length-delimited and may
  * contain ANYTHING in their payloads (including "WARC/1.0"), so
  * records cannot be split by a line-oriented reader — the unit of
  * parallelism is the FILE (real crawl corpora ship as ~1 GB
  * shards, so file-parallel is task-parallel at corpus scale).
  * `binaryFile` scan → per-file sequential parse in mapPartitions;
  * malformed records land in a quarantine row and the parser
  * RESYNCS to the next record boundary instead of abandoning the
  * rest of the shard.
  *
  * The streaming twin is the same parser over `readStream` — new
  * shards arriving in a directory are parsed as they land.
  */
object WarcSource {

  case class WarcRecord(file: String, offset: Long, warc_type: String,
      record_id: String, target_uri: String, content_length: Long,
      payload: Array[Byte])
  case class WarcBad(file: String, offset: Long, reason: String)

  private val Crlf2 = "\r\n\r\n".getBytes("US-ASCII")

  private def indexOf(hay: Array[Byte], needle: Array[Byte],
      from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Sequential record walk over one shard's bytes. Pure and
    * Spark-free, so WarcSpec can pin edge cases directly.
    */
  def parseFile(file: String, bytes: Array[Byte])
      : (Seq[WarcRecord], Seq[WarcBad]) = {
    val recs = Seq.newBuilder[WarcRecord]
    val bad = Seq.newBuilder[WarcBad]
    var off = 0
    def resync(from: Int): Int = {
      val n = indexOf(bytes, "\r\nWARC/".getBytes("US-ASCII"), from)
      if (n < 0) bytes.length else n + 2
    }
    while (off < bytes.length) {
      // skip inter-record CRLFs
      while (off < bytes.length &&
        (bytes(off) == '\r' || bytes(off) == '\n')) off += 1
      if (off >= bytes.length) return (recs.result(), bad.result())
      val start = off
      val hdrEnd = indexOf(bytes, Crlf2, off)
      if (hdrEnd < 0) {
        bad += WarcBad(file, start.toLong, "unterminated header block")
        return (recs.result(), bad.result())
      }
      val header = new String(bytes, off, hdrEnd - off, "ISO-8859-1")
      val lines = header.split("\r\n")
      if (!lines.head.startsWith("WARC/")) {
        bad += WarcBad(file, start.toLong, "missing WARC version line")
        off = resync(start)
      } else {
        val fields = lines.tail.flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None
          else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
        }.toMap
        fields.get("content-length").flatMap(_.toLongOption) match {
          case None =>
            bad += WarcBad(file, start.toLong,
              "missing or non-numeric Content-Length")
            off = resync(start)
          case Some(len) if len < 0 =>
            // header-level failure: there is no meaningful payload to
            // skip, so resync from the record start (like the
            // missing-length case), not from past the header
            bad += WarcBad(file, start.toLong,
              s"negative Content-Length: $len")
            off = resync(start)
          case Some(len) if hdrEnd + 4 + len > bytes.length =>
            bad += WarcBad(file, start.toLong,
              s"payload truncated: need $len bytes")
            off = resync(hdrEnd + 4)
          case Some(len) =>
            val p0 = hdrEnd + 4
            recs += WarcRecord(file, start.toLong,
              fields.getOrElse("warc-type", ""),
              fields.getOrElse("warc-record-id", ""),
              fields.getOrElse("warc-target-uri", ""),
              len,
              java.util.Arrays.copyOfRange(bytes, p0, p0 + len.toInt))
            off = p0 + len.toInt
        }
      }
    }
    (recs.result(), bad.result())
  }

  private val GzMagic = Array(0x1F.toByte, 0x8B.toByte, 0x08.toByte)

  /** Per-member gunzip for `.warc.gz` shards (RFC 1952): real crawl
    * archives are a CONCATENATION of gzip members, one per WARC
    * record, so a corrupt member must cost one record, not the rest
    * of the shard — each member is inflated independently (raw
    * deflate after a manual header walk, CRC32 + ISIZE verified) and
    * a failed member quarantines with a resync to the next member
    * magic, mirroring the plain parser's record-level resync.
    * Returns the concatenated inflated bytes plus member-level
    * quarantine rows (offsets are compressed-stream offsets).
    */
  def gunzipMembers(file: String, bytes: Array[Byte])
      : (Array[Byte], Seq[WarcBad]) = {
    val out = new java.io.ByteArrayOutputStream()
    val bad = Seq.newBuilder[WarcBad]
    def resync(from: Int): Int = {
      var i = from
      val last = bytes.length - GzMagic.length
      while (i <= last) {
        if (bytes(i) == GzMagic(0) && bytes(i + 1) == GzMagic(1) &&
          bytes(i + 2) == GzMagic(2)) return i
        i += 1
      }
      bytes.length
    }
    var off = 0
    while (off < bytes.length) {
      val start = off
      def fail(reason: String): Unit = {
        bad += WarcBad(file, start.toLong, s"gzip: $reason")
        off = resync(start + 1)
      }
      if (off + 10 > bytes.length ||
        bytes(off) != GzMagic(0) || bytes(off + 1) != GzMagic(1))
        fail("missing member magic")
      else if (bytes(off + 2) != 0x08) fail("unsupported compression method")
      else {
        val flg = bytes(off + 3) & 0xFF
        var h = off + 10
        var headerOk = true
        if ((flg & 0x04) != 0) { // FEXTRA
          if (h + 2 > bytes.length) headerOk = false
          else h += 2 + ((bytes(h) & 0xFF) | ((bytes(h + 1) & 0xFF) << 8))
        }
        if (headerOk && (flg & 0x08) != 0) { // FNAME, zero-terminated
          while (h < bytes.length && bytes(h) != 0) h += 1
          h += 1
        }
        if (headerOk && (flg & 0x10) != 0) { // FCOMMENT
          while (h < bytes.length && bytes(h) != 0) h += 1
          h += 1
        }
        if (headerOk && (flg & 0x02) != 0) h += 2 // FHCRC
        if (!headerOk || h >= bytes.length) fail("truncated member header")
        else {
          val inflater = new java.util.zip.Inflater(true) // raw deflate
          inflater.setInput(bytes, h, bytes.length - h)
          val buf = new Array[Byte](64 * 1024)
          val member = new java.io.ByteArrayOutputStream()
          var broken: String = null
          try {
            while (broken == null && !inflater.finished()) {
              val n = inflater.inflate(buf)
              if (n > 0) member.write(buf, 0, n)
              else if (!inflater.finished())
                broken = "truncated deflate stream"
            }
          } catch {
            case e: java.util.zip.DataFormatException =>
              broken = s"corrupt deflate stream"
          }
          val consumed = (bytes.length - h) - inflater.getRemaining
          inflater.end()
          if (broken != null) fail(broken)
          else if (h + consumed + 8 > bytes.length) fail("truncated trailer")
          else {
            val t = h + consumed
            def le4(i: Int): Long =
              (bytes(i) & 0xFFL) | ((bytes(i + 1) & 0xFFL) << 8) |
                ((bytes(i + 2) & 0xFFL) << 16) | ((bytes(i + 3) & 0xFFL) << 24)
            val m = member.toByteArray
            val crc = new java.util.zip.CRC32()
            crc.update(m)
            if (crc.getValue != le4(t)) fail("member CRC32 mismatch")
            else if ((m.length.toLong & 0xFFFFFFFFL) != le4(t + 4))
              fail("member ISIZE mismatch")
            else {
              out.write(m)
              off = t + 8
            }
          }
        }
      }
    }
    (out.toByteArray, bad.result())
  }

  /** Dispatch on shard format: gzip members are inflated first (their
    * quarantine rows carry compressed offsets and a `gzip:` reason
    * prefix; record offsets then index the INFLATED stream), plain
    * shards parse directly.
    */
  def parseAny(file: String, bytes: Array[Byte])
      : (Seq[WarcRecord], Seq[WarcBad]) =
    if (bytes.length >= 2 && bytes(0) == GzMagic(0) &&
      bytes(1) == GzMagic(1)) {
      val (inflated, gzBad) = gunzipMembers(file, bytes)
      val (recs, bad) = parseFile(file, inflated)
      (recs, gzBad ++ bad)
    } else parseFile(file, bytes)

  private def parsed(spark: SparkSession, files: DataFrame)
      : DataFrame = {
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (path, bytes) =>
          val (recs, bads) = parseAny(path, bytes)
          recs.iterator.map(r => (Some(r), Option.empty[WarcBad])) ++
            bads.iterator.map(b => (Option.empty[WarcRecord], Some(b)))
        }
      }
      .toDF("rec", "bad")
  }

  /** One pass, two streams: cache the result and split with
    * [[records]] / [[quarantine]] (same contract as EventLogSource).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    parsed(spark, spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc{,.gz}").load(path))

  /** The binaryFile source's fixed schema — streaming reads demand
    * it explicitly (schema-explicit is the house rule anyway: no
    * inference pass at scale).
    */
  private val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  def readStream(spark: SparkSession, path: String): DataFrame =
    parsed(spark, spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc{,.gz}").load(path))

  def records(parsed: DataFrame): DataFrame =
    parsed.filter(col("rec").isNotNull).select("rec.*")

  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col("bad").isNotNull).select("bad.*")
}
