package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.HtmlExtract
import graft.sources.WarcSource

/** WARC shard parsing: Content-Length discipline (payloads may
  * contain record markers), quarantine + resync on corruption, the
  * streaming twin, and composition into the HTML extraction step —
  * the crawl-ingest front door of the pipeline family.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(tpe: String, id: String, uri: String,
      payload: String): Array[Byte] = {
    val p = payload.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: $tpe\r\nWARC-Record-ID: $id\r\n" +
      s"WARC-Target-URI: $uri\r\nContent-Length: ${p.length}\r\n\r\n")
      .getBytes("US-ASCII") ++ p ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  test("parses records by Content-Length, not line scanning") {
    // payload CONTAINS a fake record header — a line-oriented
    // splitter would cut it; Content-Length must not
    val trap = "leading text\r\nWARC/1.0\r\nContent-Length: 9999\r\nx"
    val bytes = rec("response", "<urn:a>", "https://e.com/1", trap) ++
      rec("metadata", "<urn:b>", "https://e.com/2", "tiny")
    val dir = Files.createTempDirectory("graft_warc1").toFile
    Files.write(new java.io.File(dir, "s.warc").toPath, bytes)
    val parsed = WarcSource.read(spark, dir.getAbsolutePath).cache()
    val recs = WarcSource.records(parsed)
      .orderBy("offset")
      .select("warc_type", "record_id", "target_uri", "payload")
      .as[(String, String, String, Array[Byte])].collect()
    assert(recs.length == 2)
    assert(recs(0)._1 == "response" && recs(0)._3 == "https://e.com/1")
    assert(new String(recs(0)._4, "UTF-8") == trap)
    assert(recs(1)._2 == "<urn:b>" &&
      new String(recs(1)._4, "UTF-8") == "tiny")
    assert(WarcSource.quarantine(parsed).count() == 0)
  }

  test("quarantines corrupt records and resyncs to the next boundary") {
    val badRec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: not-a-number\r\n\r\n").getBytes("US-ASCII")
    val negRec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: -1\r\n\r\n").getBytes("US-ASCII")
    val bytes = rec("response", "<urn:a>", "https://e.com/1", "first") ++
      badRec ++ negRec ++
      rec("response", "<urn:c>", "https://e.com/3", "after the bad one")
    val dir = Files.createTempDirectory("graft_warc2").toFile
    Files.write(new java.io.File(dir, "s.warc").toPath, bytes)
    val parsed = WarcSource.read(spark, dir.getAbsolutePath).cache()
    val recs = WarcSource.records(parsed).orderBy("offset")
      .select("record_id").as[String].collect()
    assert(recs.toSeq == Seq("<urn:a>", "<urn:c>"),
      "the record after the corrupt one must survive (resync)")
    val bad = WarcSource.quarantine(parsed)
      .select("reason").as[String].collect()
    assert(bad.length == 2 && bad.forall(_.contains("Content-Length")))
    assert(bad.exists(_.contains("negative")),
      "Content-Length: -1 must quarantine, not crash the shard")
  }

  test("streaming twin parses arriving shards identically") {
    val dir = Files.createTempDirectory("graft_warc3").toFile
    val bytes = rec("response", "<urn:s1>", "https://e.com/a", "alpha") ++
      rec("response", "<urn:s2>", "https://e.com/b", "beta")
    val q = WarcSource.records(
        WarcSource.readStream(spark, dir.getAbsolutePath))
      .selectExpr("record_id", "CAST(payload AS STRING) AS body")
      .writeStream.format("memory").queryName("warc_t")
      .outputMode("append").start()
    try {
      Files.write(new java.io.File(dir, "s1.warc").toPath, bytes)
      q.processAllAvailable()
      val got = spark.table("warc_t")
        .as[(String, String)].collect().toSet
      assert(got == Set("<urn:s1>" -> "alpha", "<urn:s2>" -> "beta"))
    } finally q.stop()
  }

  test("composes into HTML extraction: the crawl-ingest front door") {
    val html = "<html><body><script>x < 1;</script>" +
      "<p>Tom &amp; Jerry</p></body></html>"
    val bytes = rec("response", "<urn:h>", "https://e.com/h", html)
    val dir = Files.createTempDirectory("graft_warc4").toFile
    Files.write(new java.io.File(dir, "s.warc").toPath, bytes)
    val text = WarcSource.records(
        WarcSource.read(spark, dir.getAbsolutePath))
      .select(HtmlExtract.extract(
        col("payload").cast("string")).as("t"))
      .as[String].head()
    assert(text == "Tom & Jerry")
  }

  /** One gzip member per record — the Common Crawl `.warc.gz` layout
    * (each record independently compressed so readers can resync).
    */
  private def gzMember(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(data); gz.close()
    out.toByteArray
  }

  test("per-member gzip shards parse identically to plain shards") {
    val r1 = rec("response", "<urn:g1>", "https://e.com/g1", "alpha payload")
    val r2 = rec("metadata", "<urn:g2>", "https://e.com/g2", "beta")
    val gz = gzMember(r1) ++ gzMember(r2)
    val dir = Files.createTempDirectory("graft_warc5").toFile
    Files.write(new java.io.File(dir, "s.warc.gz").toPath, gz)
    Files.write(new java.io.File(dir, "p.warc").toPath, r1 ++ r2)
    val parsed = WarcSource.read(spark, dir.getAbsolutePath).cache()
    val recs = WarcSource.records(parsed)
      .select("file", "record_id")
      .as[(String, String)].collect()
    // both shards yield both records; the .gz and plain contents agree
    assert(recs.count(_._1.endsWith("s.warc.gz")) == 2)
    assert(recs.count(_._1.endsWith("p.warc")) == 2)
    assert(WarcSource.quarantine(parsed).count() == 0)
  }

  test("a corrupt gzip member costs one record, not the shard") {
    val r1 = rec("response", "<urn:c1>", "https://e.com/c1", "first")
    val r2 = rec("response", "<urn:c2>", "https://e.com/c2", "second")
    val r3 = rec("response", "<urn:c3>", "https://e.com/c3", "third")
    val m2 = gzMember(r2)
    m2(12) = (m2(12) ^ 0x55).toByte // corrupt the deflate body
    val (inflated, bad) = WarcSource.gunzipMembers("f",
      gzMember(r1) ++ m2 ++ gzMember(r3))
    assert(bad.nonEmpty && bad.forall(_.reason.startsWith("gzip:")))
    val (recs, bad2) = WarcSource.parseFile("f", inflated)
    assert(recs.map(_.record_id) == Seq("<urn:c1>", "<urn:c3>"),
      "surviving members must still parse")
    assert(bad2.isEmpty)
  }

  test("gzip member walk verifies CRC and ISIZE, survives FNAME/FEXTRA") {
    val r = rec("response", "<urn:x>", "https://e.com/x", "data")
    val base = gzMember(r)
    // flip a trailer CRC byte: member must quarantine
    val crcFlip = base.clone()
    crcFlip(base.length - 6) = (crcFlip(base.length - 6) ^ 1).toByte
    val (out1, bad1) = WarcSource.gunzipMembers("f", crcFlip)
    assert(out1.isEmpty && bad1.exists(_.reason.contains("CRC")))
    // an FNAME header survives the walk (flag bit 3 + name bytes)
    val named = base.clone()
    val withName = named.take(10) ++
      "shard.warc\u0000".getBytes("ISO-8859-1") ++ named.drop(10)
    withName(3) = (withName(3) | 0x08).toByte
    val (out2, bad2) = WarcSource.gunzipMembers("f", withName)
    assert(bad2.isEmpty && out2.sameElements(r), "FNAME member must decode")
    // totality on arbitrary bytes
    val rnd = new scala.util.Random(0x6A2B)
    for (_ <- 1 to 200) {
      val junk = Array.fill(rnd.nextInt(150))(rnd.nextInt(256).toByte)
      WarcSource.gunzipMembers("f", junk)
      WarcSource.parseAny("f", Array[Byte](0x1F.toByte, 0x8B.toByte) ++ junk)
    }
  }
}
