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

  private def parsed(spark: SparkSession, files: DataFrame)
      : DataFrame = {
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (path, bytes) =>
          val (recs, bads) = parseFile(path, bytes)
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
      .option("pathGlobFilter", "*.warc").load(path))

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
      .option("pathGlobFilter", "*.warc").load(path))

  def records(parsed: DataFrame): DataFrame =
    parsed.filter(col("rec").isNotNull).select("rec.*")

  def quarantine(parsed: DataFrame): DataFrame =
    parsed.filter(col("bad").isNotNull).select("bad.*")
}
