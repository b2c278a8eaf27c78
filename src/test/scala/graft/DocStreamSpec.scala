package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, PiiScrub}
import graft.streaming.DocStream

/** Streaming twins of the document-curation steps, driven through
  * MemoryStream, each parity-checked against its batch definition.
  */
object DocStreamSpec {
  case class Doc(doc_id: Long, ingest_ts: Timestamp, text: String)
  case class QDoc(doc_id: Long, lang: String, n_chars: Long)
  case class LDoc(doc_id: Long, lang: String, text: String)
}

class DocStreamSpec extends SparkSpec {
  import spark.implicits._
  import DocStreamSpec.Doc

  private def doc(id: Long, min: Long, text: String): Doc =
    Doc(id, new Timestamp(min * 60000L), text)

  test("parity: streaming PII scrub equals the batch PiiScrub plan") {
    val rows = Seq(
      doc(1, 10, "mail me at a.b@mail.example.com now"),
      doc(2, 11, "call 555-1234 or 555-9876"),
      doc(3, 12, "nothing sensitive here"))
    val stream = MemoryStream[Doc](spark)
    val q = DocStream.scrubbed(stream.toDF())
      .writeStream.format("memory").queryName("scrub_t")
      .outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("scrub_t")
        .select("doc_id", "n_emails", "n_phones", "scrubbed")
        .as[(Long, Long, Long, String)].collect().toSet
      val want = PiiScrub.scrub(rows.toDF())
        .select("doc_id", "n_emails", "n_phones", "scrubbed")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == want)
      assert(got.exists(r => r._4 == "mail me at <EMAIL> now"))
    } finally q.stop()
  }

  test("parity: streaming quality gate equals the batch d13 filter") {
    // One doc passes every gate (en, long, diverse); the others each
    // fail one: stopword-free (lang 'und'), too short, low TTR.
    val good = "the quick brown fox jumps over a lazy dog while " +
      (1 to 60).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      doc(1, 10, good),
      doc(2, 11, (1 to 60).map(i => s"x$i").mkString(" ")), // no stopwords
      doc(3, 12, "the tiny a"),                             // too short
      doc(4, 13, "the " + Seq.fill(80)("spam").mkString(" ")))
    val stream = MemoryStream[Doc](spark)
    val q = DocStream.qualityGated(stream.toDF())
      .writeStream.format("memory").queryName("qgate_t")
      .outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("qgate_t")
        .as[(Long, Long)].collect().toSet
      val want = DocStream.qualityGated(rows.toDF())
        .as[(Long, Long)].collect().toSet
      assert(got == want) // ONE definition, both engines
      assert(got.map(_._1) == Set(1L))
    } finally q.stop()
  }

  test("parity: streaming incremental dedup equals batch minhashLshAgainst") {
    // Static corpus a pipeline already keeps; the stream delivers the
    // daily delta: one exact copy (jaccard 1.0), one appended-token
    // near-dup, one unrelated doc sharing no shingles.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "red green blue cyan magenta yellow black white"))
      .toDF("doc_id", "text")
    val deltaRows = Seq(
      doc(101, 10, "alpha beta gamma delta epsilon zeta eta theta"),
      doc(102, 11, "one two three four five six seven eight nine"),
      doc(103, 12, "completely unrelated words live here instead now"))
    val stream = MemoryStream[Doc](spark)
    val q = DocStream.incrementalDedup(stream.toDF(), corpus,
        minJaccard = 0.8)
      .writeStream.format("memory").queryName("incdedup_t")
      .outputMode("append").start()
    try {
      stream.addData(deltaRows: _*)
      q.processAllAvailable()
      val got = spark.table("incdedup_t")
        .as[(Long, Long, Long)].collect().toSet
      val want = Dedup.minhashLshAgainst(
          deltaRows.toDF().select(col("doc_id"), col("text")), corpus,
          minJaccard = 0.8)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want) // band join + verify: one definition's worth
      // The exact copy is always found, at jaccard exactly 1.
      assert(got.contains((101L, 1L, 1000000L)))
      // The unrelated doc shares no shingle bucket with any corpus doc.
      assert(!got.exists(_._1 == 103L))
      // A second micro-batch re-delivering the same pair within the
      // watermark is suppressed by the (da, db) dedup state.
      stream.addData(doc(101, 13,
        "alpha beta gamma delta epsilon zeta eta theta"))
      q.processAllAvailable()
      val again = spark.table("incdedup_t")
        .as[(Long, Long, Long)].collect().toSeq
      assert(again.count(r => r._1 == 101L && r._2 == 1L) == 1)
    } finally q.stop()
  }

  test("parity: streaming winnowing dedup equals batch winnowingAgainst") {
    // The d82 candidate path's streaming twin: corpus a pipeline
    // already keeps; deltas arrive over TWO micro-batches so a
    // cross-batch candidate proves the stream-static join finds
    // pairs whenever they arrive, not only in the first batch.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "red green blue cyan magenta yellow black white"))
      .toDF("doc_id", "text")
    val batch1 = Seq(
      doc(101, 10, "alpha beta gamma delta epsilon zeta eta theta"),
      doc(103, 12, "completely unrelated words live here instead now"))
    // 102 shares the 6-token run "one two three four five six" with
    // corpus doc 2 — the winnowing shared-run guarantee must surface
    // it as a candidate even though the suffix diverges.
    val batch2 = Seq(
      doc(102, 11, "one two three four five six apple pear plum"))
    val stream = MemoryStream[Doc](spark)
    val q = DocStream.incrementalWinnowDedup(stream.toDF(), corpus,
        minJaccard = 0.15)
      .writeStream.format("memory").queryName("incwinnow_t")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("incwinnow_t")
        .as[(Long, Long, Long)].collect().toSet
      val want = Dedup.winnowingAgainst(
          (batch1 ++ batch2).toDF().select(col("doc_id"), col("text")),
          corpus, minJaccard = 0.15)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"stream $got vs batch $want")
      // The exact copy is found at jaccard exactly 1; the cross-batch
      // shared-run pair is found; the unrelated doc pairs with no one.
      assert(got.contains((101L, 1L, 1000000L)))
      assert(got.exists(p => p._1 == 102L && p._2 == 2L))
      assert(!got.exists(_._1 == 103L))
      // Re-delivering a pair within the watermark is suppressed by
      // the (da, db) dedup state.
      stream.addData(doc(101, 13,
        "alpha beta gamma delta epsilon zeta eta theta"))
      q.processAllAvailable()
      val again = spark.table("incwinnow_t")
        .as[(Long, Long, Long)].collect().toSeq
      assert(again.count(r => r._1 == 101L && r._2 == 1L) == 1)
    } finally { q.stop(); spark.catalog.clearCache() }
  }

  test("parity: streaming chunking equals the batch d22 explode") {
    val rows = Seq(
      doc(1, 10, (1 to 80).map(i => s"w$i").mkString(" ")), // 4 chunks
      doc(2, 11, "tiny doc"))                               // 1 chunk
    val stream = MemoryStream[Doc](spark)
    val q = DocStream.chunked(stream.toDF())
      .writeStream.format("memory").queryName("chunk_t")
      .outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("chunk_t")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = DocStream.chunked(rows.toDF())
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want) // ONE definition, both engines
      assert(got.count(_._1 == 1L) == 4 && got.count(_._1 == 2L) == 1)
    } finally q.stop()
  }

  test("streaming dedup keeps first arrival, agrees with batch d1 groups") {
    val stream = MemoryStream[Doc](spark)
    val q = DocStream.dedup(stream.toDF())
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      // Batch 1: three distinct docs. Batch 2: two in-watermark
      // copies (same text, higher ids) and one genuinely new doc.
      stream.addData(doc(1, 100, "alpha beta"), doc(2, 101, "gamma"),
        doc(3, 102, "delta epsilon"))
      q.processAllAvailable()
      stream.addData(doc(11, 110, "Alpha  Beta ".toLowerCase),
        doc(12, 111, "gamma"), doc(13, 112, "zeta"))
      q.processAllAvailable()
      val got = spark.table("dedup_t").select("doc_id")
        .as[Long].collect().toSet
      // "alpha  beta" normalizes differently (inner double space) ->
      // doc 11 survives; doc 12 is an exact dup of 2 -> dropped.
      assert(got == Set(1L, 2L, 3L, 11L, 13L))

      // Batch view of the same corpus: exactDupGroups must name the
      // streaming survivors as keepers of their duplicate groups.
      val all = Seq(doc(1, 100, "alpha beta"), doc(2, 101, "gamma"),
        doc(3, 102, "delta epsilon"), doc(11, 110, "alpha  beta "),
        doc(12, 111, "gamma"), doc(13, 112, "zeta"))
        .toDF().select(col("doc_id"), col("text"))
      val groups = Dedup.exactDupGroups(all)
        .as[(Long, Long)].collect().toMap
      assert(groups == Map(2L -> 2L)) // one dup group, kept id 2, size 2
    } finally q.stop()
  }

  test("parity: streaming per-lang HLL registers equal the batch aggregate") {
    import DocStreamSpec.LDoc
    // varied vocab so registers are non-trivial; two batches so the
    // state-store merge path (element-wise max across micro-batches)
    // is what produces the final registers
    def txt(i: Long): String =
      (1 to 12).map(j => s"w${(i * 7 + j * 3) % 40}").mkString(" ")
    val b1 = (1L to 30L).map(i =>
      LDoc(i, if (i % 3 == 0) "en" else "de", txt(i)))
    val b2 = (31L to 60L).map(i =>
      LDoc(i, if (i % 3 == 0) "en" else "de", txt(i)))
    val stream = MemoryStream[LDoc](spark)
    val q = DocStream.hllPerLang(stream.toDF())
      .writeStream.format("memory").queryName("hll_t")
      .outputMode("complete").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("hll_t")
        .as[(String, Seq[Int])].collect().toMap
      // ONE definition serves both engines: the same plan on the
      // union as a batch frame must give identical registers
      val want = DocStream.hllPerLang((b1 ++ b2).toDF())
        .as[(String, Seq[Int])].collect().toMap
      assert(got.keySet == Set("en", "de"))
      assert(got == want)
      assert(got("en").length == 64 && got("en").exists(_ > 0))
    } finally q.stop()
  }

  test("parity: streaming sample quantiles equal batch across microbatches") {
    import graft.operators.Sampling
    import DocStreamSpec.QDoc
    // k = 4 forces real sample EVICTION: the bottom-4-by-hash of the
    // union must emerge from merging microbatch partial heaps, not
    // from any single batch fitting under k.
    val b1 = (1L to 20L).map(i => QDoc(i, if (i % 2 == 0) "en" else "de",
      i * 10))
    val b2 = (21L to 40L).map(i => QDoc(i, if (i % 2 == 0) "en" else "de",
      i * 10))
    val stream = MemoryStream[QDoc](spark)
    val q = DocStream.sampleQuantiles(stream.toDF(), k = 4)
      .writeStream.format("memory").queryName("squant_t")
      .outputMode("complete").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("squant_t")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      val want = Sampling.hashSampleQuantiles(
        (b1 ++ b2).toDF(), "lang", "doc_id", "n_chars", k = 4,
        outSuffix = "chars")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want)
      assert(got.forall(r => r._2 == 20L && r._3 == 4L),
        "20 docs per stratum, sample capped at k = 4")
    } finally q.stop()
  }

  test("file job: batch-incremental curation drains only unseen files") {
    import graft.sources.StreamCuratePipeline
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_scurate").toFile
      .getAbsolutePath
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    def doc(i: Long, en: Boolean) = (i,
      if (en) s"the quick brown fox number $i jumps over the lazy dog " +
        s"and then runs far away with all the other good animals " +
        s"mail me at user$i@example.com"
      else "der die das und nicht aber doch eins zwei drei vier fünf " +
        "sechs sieben acht neun zehn elf zwölf dreizehn vierzehn")
    // Batch 1: 8 English (gated IN, emails scrubbed) + 4 German (cut).
    ((1L to 8L).map(doc(_, true)) ++ (101L to 104L).map(doc(_, false)))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    StreamCuratePipeline.run(spark, in, out, chk,
      minScore = 0.0, minTokens = 1L)
    val r1 = spark.read.parquet(out)
    assert(r1.select("doc_id").as[Long].collect().sorted.toSeq ==
      (1L to 8L))
    assert(r1.filter(col("n_emails") =!= 1).isEmpty,
      "every English doc planted exactly one email")
    assert(r1.filter(col("text").contains("@")).isEmpty,
      "scrub left a raw email in the curated text")

    // Batch 2 arrives; a SECOND run on the same checkpoint must
    // append exactly the new survivors — nothing reprocessed.
    ((9L to 12L).map(doc(_, true)) ++ Seq(doc(105L, false)))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    StreamCuratePipeline.run(spark, in, out, chk,
      minScore = 0.0, minTokens = 1L)
    val r2 = spark.read.parquet(out)
    assert(r2.count() == 12,
      s"expected 8 + 4 curated rows, got ${r2.count()}")
    assert(r2.select("doc_id").distinct().count() == 12,
      "a restart reprocessed already-seen files")
  }

  test("parity: streaming noveltyAgainst equals the batch scoring") {
    // Corpus: 9 tokens c1..c9 ⇒ distinct 8-grams (c1..c8), (c2..c9).
    // Delta 10 = the same text (both grams known, novelty 0);
    // 11 = 8 fresh tokens (one gram, unseen, novelty 10000);
    // 12 = c2..c9 + x (one known gram, one new ⇒ novelty 5000);
    // 13 = under 8 tokens ⇒ no gram, no row, matching d55.
    val corpus = Seq((1L, (1 to 9).map("c" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val cg = DocStream.corpusGramTable(corpus)
    def t(i: Int) = new Timestamp(600000L + i * 1000)
    val delta = Seq(
      Doc(10L, t(0), (1 to 9).map("c" + _).mkString(" ")),
      Doc(11L, t(1), (1 to 8).map("u" + _).mkString(" ")),
      Doc(12L, t(2), ((2 to 9).map("c" + _) :+ "x").mkString(" ")),
      Doc(13L, t(3), "far too short for a gram"))
    val want = DocStream.noveltyAgainst(delta.toDF(), cg)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want == Set((10L, 2L, 2L, 0L), (11L, 1L, 0L, 10000L),
      (12L, 2L, 1L, 5000L)))

    val stream = MemoryStream[Doc](spark)
    val q = DocStream.noveltyAgainst(stream.toDF(), cg)
      .writeStream.format("memory").queryName("novelty_t")
      .outputMode("complete").start()
    try {
      stream.addData(delta: _*)
      q.processAllAvailable()
      val got = spark.table("novelty_t")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }
}
