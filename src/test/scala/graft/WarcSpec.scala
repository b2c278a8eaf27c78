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
}
