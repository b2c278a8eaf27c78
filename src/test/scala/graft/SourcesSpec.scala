package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CsvSource, EventLogSource, OrcSink, ParquetSink}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL event source: clean rows parse, malformed lines quarantine") {
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    val f = new java.io.File(dir, "part-0.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"event_id":1,"ts":"2026-01-01T00:00:00Z","user_id":7,""" +
      """"event_type":"click","value":1.5,"props":"{\"k\":3}"}""")
    w.println("""{"event_id":2,"ts":"2026-01-01T01:00:00Z","user_id":8,""" +
      """"event_type":"view","value":0.5,"props":null}""")
    w.println("""this is not json at all""")
    w.close()

    // Cached: one scan feeding the clean + quarantine consumers (and
    // Spark disallows querying only _corrupt_record off a raw scan).
    val raw = EventLogSource.read(spark, dir.getAbsolutePath).cache()
    val clean = EventLogSource.clean(raw)
    assert(clean.count() == 2)
    assert(clean.select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    val bad = EventLogSource.corrupt(raw).as[String].collect()
    assert(bad.toSeq == Seq("this is not json at all"))
  }

  test("CSV source: typed clean rows, malformed lines quarantine") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "part-0.csv"))
    w.println("id,name,score")
    w.println("1,alice,2.5")
    w.println("2,bob,not_a_double") // type error -> corrupt
    w.println("3,carol,9.0")
    w.close()

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    val raw = CsvSource.read(spark, dir.getAbsolutePath, schema).cache()
    val clean = CsvSource.clean(raw)
    assert(clean.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alice", 2.5), (3L, "carol", 9.0)))
    assert(CsvSource.corrupt(raw).as[String].collect().toSeq ==
      Seq("2,bob,not_a_double"))
  }

  test("partitioned parquet sink: directory layout prunes, round-trips") {
    val dir = Files.createTempDirectory("graft_psink").toFile.getAbsolutePath
    val df = Seq(
      (1L, "2026-01-01", 30L), (2L, "2026-01-01", 10L),
      (3L, "2026-01-02", 20L), (4L, "2026-01-02", 5L))
      .toDF("id", "dt", "v")
    ParquetSink.writePartitioned(df, dir, Seq("dt"), Seq("v"))

    // Hive-style directories exist — the structure partition pruning
    // keys off.
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("dt=")).sorted.toSeq
    assert(dirs == Seq("dt=2026-01-01", "dt=2026-01-02"))

    val back = spark.read.parquet(dir)
    assert(back.count() == 4)
    assert(back.filter(col("dt") === "2026-01-02")
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))

    // The dt filter must become a PartitionFilter (directory-level
    // prune — the scan never opens the other date's files), NOT a
    // data filter evaluated per row after reading everything.
    val p = back.filter(col("dt") === "2026-01-02")
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*dt".r.findFirstIn(p).isDefined,
      s"dt filter did not prune at the directory level\n$p")
  }

  test("token-budgeted shard export: complete, deterministic, balanced") {
    val dir = Files.createTempDirectory("graft_shards").toFile
      .getAbsolutePath
    // 400 docs × 10-70 tokens (deterministic lengths), ~16k tokens;
    // 2k budget ⇒ 8+ shards with real balance to check.
    val docs = (1L to 400L)
      .map(i => (i, 10 + (i * 7 % 61), s"doc $i"))
      .toDF("doc_id", "n_tokens", "text")
    val n = ParquetSink.writeTokenShards(docs, dir, "doc_id",
      "n_tokens", tokensPerShard = 2000L)
    val total = (1L to 400L).map(i => 10 + (i * 7 % 61)).sum
    assert(n == math.ceil(total / 2000.0).toInt)

    val back = spark.read.parquet(dir)
    // Complete and exactly-once.
    assert(back.count() == 400)
    assert(back.select("doc_id").distinct().count() == 400)
    // One data file per shard directory — no small-file explosion.
    for (sd <- new java.io.File(dir).listFiles()
        if sd.getName.startsWith("shard=")) {
      assert(sd.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${sd.getName} has multiple files")
    }
    // Hash assignment concentrates shard sums near the budget: every
    // shard within [0.4×, 1.9×] at this scale, and the assignment is
    // the pinned content hash (re-running yields identical layout).
    val sums = back.groupBy("shard").agg(sum("n_tokens").as("t"))
      .select("t").as[Long].collect()
    assert(sums.length == n)
    assert(sums.forall(t => t >= 800 && t <= 3800),
      s"unbalanced shards: ${sums.mkString(",")}")
    val again = Files.createTempDirectory("graft_shards2").toFile
      .getAbsolutePath
    ParquetSink.writeTokenShards(docs, again, "doc_id", "n_tokens", 2000L)
    val a = spark.read.parquet(dir).select("doc_id", "shard")
    val b = spark.read.parquet(again).select("doc_id", "shard")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("shuffled shard export: files hold the deterministic training order") {
    import graft.functions.TextHashExprs.string_poly_hash
    import graft.operators.Sampling.{Mixer, MixMod}
    val dir = Files.createTempDirectory("graft_shufshards").toFile
      .getAbsolutePath
    val docs = (1L to 400L)
      .map(i => (i, 10 + (i * 7 % 61), s"doc $i"))
      .toDF("doc_id", "n_tokens", "text")
    val n = ParquetSink.writeTokenShards(docs, dir, "doc_id",
      "n_tokens", tokensPerShard = 2000L, shuffled = true)
    // Same shard ASSIGNMENT as the unshuffled writer (d65 only
    // changes within-file order), rows complete.
    val back = spark.read.parquet(dir)
    assert(back.count() == 400 &&
      back.select("doc_id").distinct().count() == 400)
    // Each shard file's PHYSICAL row order is Sampling.shuffleOrder's
    // (mixed hash, id) — and not id order (the point of d65: a
    // trainer streaming the file must not see crawl-ordered docs).
    var anyIdOrderBroken = false
    for (sd <- new java.io.File(dir).listFiles()
        if sd.getName.startsWith("shard=")) {
      val f = sd.listFiles().filter(_.getName.endsWith(".parquet")).head
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select(col("doc_id"),
          (string_poly_hash(col("doc_id").cast("string"))
            * Mixer % MixMod).as("k"))
        .as[(Long, Long)].collect().toSeq
      assert(rows == rows.sortBy { case (id, k) => (k, id) },
        s"${sd.getName} not in shuffled training order")
      if (rows.map(_._1) != rows.map(_._1).sorted) anyIdOrderBroken = true
    }
    assert(n > 1 && anyIdOrderBroken,
      "shuffle left every shard in id order — the mixer is not mixing")
  }

  test("index health card: appends off-distribution degrade it monotonically") {
    import graft.sources.IndexPipeline
    val idx = Files.createTempDirectory("graft_healthidx").toFile
      .getAbsolutePath
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    IndexPipeline.build(spark, emb, idx, k = 4, iters = 2)
    def health(): Map[Long, (Long, Long, Long)] =
      IndexPipeline.healthCard(spark, idx)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def driftMass(h: Map[Long, (Long, Long, Long)]): Long =
      h.values.map { case (n, _, d) => n * d }.sum
    val h0 = health()
    assert(h0.values.map(_._2).sum >= 1000000L * (h0.size - 1),
      "fill factors must sum to ~nlist×1e6")
    // Append NEGATED vectors under fresh ids — they land in whatever
    // cell argmax-routes them, far from its centroid, dragging that
    // cell's population mean off the stored routing vector. Appending
    // the same off-distribution batch AGAIN shifts the mean further:
    // drift mass and max fill must rise monotonically — the retrain
    // trigger the card exists to fire.
    def negBatch(off: Long) = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + off).as("vec_id"),
        expr("transform(embedding, v -> -v)").as("embedding"))
    IndexPipeline.append(spark, idx, negBatch(10000L))
    val h1 = health()
    IndexPipeline.append(spark, idx, negBatch(20000L))
    val h2 = health()
    assert(driftMass(h1) > driftMass(h0) && driftMass(h2) > driftMass(h1),
      s"drift mass not monotone: ${driftMass(h0)} -> " +
        s"${driftMass(h1)} -> ${driftMass(h2)}")
    assert(h1.values.map(_._2).max >= h0.values.map(_._2).max &&
      h2.values.map(_._2).max >= h1.values.map(_._2).max,
      "fill imbalance must not shrink as skewed appends accumulate")
  }

  test("index pipeline: on-disk IVF-SQ8 builds, prunes, and matches " +
      "an independent reference") {
    import graft.sources.IndexPipeline
    val idx = Files.createTempDirectory("graft_index").toFile
      .getAbsolutePath
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val k = IndexPipeline.build(spark, emb, idx, k = 4, iters = 2)
    assert(k >= 2, s"degenerate training: $k cells")
    val dirs = new java.io.File(s"$idx/codes").listFiles()
      .map(_.getName).filter(_.startsWith("cell=")).sorted.toSeq
    assert(dirs.size == k, s"one directory per cell: $dirs")

    val queries = emb.filter(col("vec_id") < 5)
    val res = IndexPipeline.search(spark, idx, queries, topK = 3)
    // The probe's cell filter must prune at the DIRECTORY level —
    // the on-disk inverted-list property.
    val p = res.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"cell filter did not prune directories\n$p")

    // Independent reference: quantize + route + score in plain Scala
    // from the raw arrays (no Spark plans shared with the pipeline).
    def dbl(r: org.apache.spark.sql.Row, i: Int): Array[Double] =
      r.getSeq[Any](i).map {
        case d: Double => d
        case f: Float => f.toDouble
      }.toArray
    val cents = spark.read.parquet(s"$idx/centroids")
      .select(col("cell").cast("long"), col("cvec")).collect()
      .map(r => (r.getLong(0), dbl(r, 1))).toSeq
    val raw = emb.select(col("vec_id"),
        col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> dbl(r, 1)).toMap
    def quant(v: Array[Double]): Array[Long] = {
      val mx = v.map(math.abs).max
      v.map(x => math.floor(x * 127.0 / mx + 0.5).toLong)
    }
    def cellOf(v: Array[Double]): Long = {
      val nv = math.sqrt(v.map(x => x * x).sum)
      cents.map { case (c, cv) =>
        val d = v.zip(cv).map { case (a, b) => a * b }.sum
        (c, d / (nv * math.sqrt(cv.map(x => x * x).sum)))
      }.maxBy { case (c, s) => (s, -c) }._1
    }
    val want = (0L until 5L).flatMap { qid =>
      val qv = quant(raw(qid)); val qc = cellOf(raw(qid))
      val qn = math.sqrt(qv.map(x => (x * x).toDouble).sum)
      raw.keys.filter(_ != qid)
        .filter(id => cellOf(raw(id)) == qc)
        .map { id =>
          val cv = quant(raw(id))
          val d = qv.zip(cv).map { case (a, b) => a * b }.sum.toDouble
          val s = d / (math.sqrt(cv.map(x => (x * x).toDouble).sum) * qn)
          (qid, id, s)
        }
        .toSeq.sortBy { case (_, id, s) => (-s, id) }.take(3)
        .zipWithIndex.map { case ((q2, id, s), i) =>
          (q2, qc, (i + 1).toLong, id,
            math.floor(s * 1000000 + 0.5).toLong) }
    }.toSet
    val got = res.as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == want)

    // nprobe=2 widens the scanned cells: per query the best score can
    // only improve or hold (the multi-probe recall property, now
    // against files), and the deeper scan is still directory-pruned.
    val res2 = IndexPipeline.search(spark, idx, queries, topK = 3,
      nprobe = 2)
    val best1 = res.filter(col("rank") === 1)
      .select("query_id", "sim_e6").as[(Long, Long)].collect().toMap
    val best2 = res2.filter(col("rank") === 1)
      .select("query_id", "sim_e6").as[(Long, Long)].collect().toMap
    assert(best1.keySet == best2.keySet)
    assert(best1.forall { case (q, s) => best2(q) >= s })
    val p2 = res2.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p2).isDefined,
      s"nprobe=2 scan lost directory pruning\n$p2")

    // Incremental maintenance: clones of the query vectors appended
    // under fresh ids route to the SAME cells (assignment against
    // the existing centroids) and must dominate their twin's search:
    // an identical vector scores cosine 1 and ranks first.
    val clones = queries.select((col("vec_id") + 1000L).as("vec_id"),
      col("embedding"))
    val added = IndexPipeline.append(spark, idx, clones)
    assert(added == 5)
    val res3 = IndexPipeline.search(spark, idx, queries, topK = 1)
    val top = res3.select("query_id", "cand_id")
      .as[(Long, Long)].collect().toMap
    assert((0L until 5L).forall(q => top(q) == q + 1000L),
      s"appended twin should rank first: $top")
  }

  test("curation pipeline: file in, curated shards + audit out") {
    import graft.sources.CuratePipeline
    val out = Files.createTempDirectory("graft_curate").toFile
      .getAbsolutePath
    val (kept, audit) = CuratePipeline.run(spark,
      "/root/testdata/sf0.001", out, tokensPerShard = 2000L)
    // The written corpus IS the funnel's last survivor stage.
    val want = graft.operators.CurationFunnel
      .stages(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .last.select("doc_id")
    val got = spark.read.parquet(s"$out/corpus").select("doc_id")
    assert(kept > 0 && got.except(want).isEmpty && want.except(got).isEmpty)
    // Audit monotone: survivors never increase stage over stage, and
    // the written audit table round-trips.
    val rows = spark.read.parquet(s"$out/audit")
      .orderBy("stage_id")
      .select("stage", "n_docs").as[(String, Long)].collect()
    assert(rows.map(_._1).toSeq ==
      graft.operators.CurationFunnel.StageNames)
    assert(rows.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
    assert(rows.last._2 == kept)
    assert(audit.count() == 5)
  }

  test("warc curation pipeline: crawl shards in, curated corpus out") {
    import graft.sources.{WarcCuratePipeline, WarcSource}
    // Build a tiny crawl: per-member gzip shard with HTML responses
    // (vocab-overlapping but shingle-distinct docs that pass the
    // Gopher gates), one EXACT duplicate pair, one metadata record
    // (filtered), one corrupt gzip member (quarantined).
    val pool = ("the and for with from that this have been more time " +
      "people world great energy river mountain forest signal " +
      "harvest window stone garden winter summer journey").split(" ")
    def text(seed: Int): String =
      // bracketed by "the" so every doc clears the stopword gate
      ("the" +: (0 until 58).map(j =>
        pool((seed * 7 + j * (seed + 3)) % pool.length)) :+ "the")
        .mkString(" ")
    def rec(id: String, uri: String, html: String): Array[Byte] = {
      val p = html.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: $id\r\n" +
        s"WARC-Target-URI: $uri\r\nContent-Length: ${p.length}\r\n\r\n")
        .getBytes("US-ASCII") ++ p ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    def gz(data: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write(data); g.close()
      o.toByteArray
    }
    val docs = (1 to 6).map(i =>
      rec(s"<urn:w$i>", s"https://e.com/$i", s"<html><p>${text(i)}</p></html>"))
    val dup = rec("<urn:wdup>", "https://e.com/dup",
      s"<html><p>${text(3)}</p></html>") // exact text dup of doc 3
    val meta = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "WARC-Record-ID: <urn:m>\r\nContent-Length: 2\r\n\r\nok\r\n\r\n")
      .getBytes("US-ASCII")
    val broken = gz(rec("<urn:bad>", "https://e.com/bad", "<p>x</p>"))
    broken(12) = (broken(12) ^ 0x55).toByte
    val shard = (docs :+ dup).map(gz).reduce(_ ++ _) ++ broken ++ gz(meta)
    val dir = Files.createTempDirectory("graft_wcp_in").toFile
    Files.write(new java.io.File(dir, "crawl.warc.gz").toPath, shard)
    val out = Files.createTempDirectory("graft_wcp_out").toFile
      .getAbsolutePath
    val (kept, audit) = WarcCuratePipeline.run(spark,
      dir.getAbsolutePath, out, tokensPerShard = 500L)
    val rows = audit.select("stage", "n_docs")
      .as[(String, Long)].collect().toMap
    assert(rows("raw") == 7, "6 distinct + 1 dup response docs in")
    assert(rows("exact_dedup") == rows("rules") - 1,
      "the exact duplicate must collapse")
    assert(kept == rows("decontam"))
    // corpus rows carry url + token counts and match the final stage
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() == kept)
    assert(corpus.columns.toSet ==
      Set("doc_id", "url", "text", "n_tokens", "shard"))
    // the corrupt gzip member is quarantined, the shard survives
    val q = spark.read.parquet(s"$out/quarantine")
      .select("reason").as[String].collect()
    assert(q.length == 1 && q.head.startsWith("gzip:"))
    // parity: the same shard parsed directly yields the same docs
    val direct = WarcCuratePipeline.documentsFrom(
      WarcSource.read(spark, dir.getAbsolutePath))
    assert(direct.count() == 7)
  }

  test("warc media fork: image and audio responses route by signature") {
    import graft.sources.{WarcCuratePipeline, WarcSource}
    import graft.multimodal.{Gif, Png, Wav}
    def recB(id: String, uri: String, p: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: $id\r\n" +
        s"WARC-Target-URI: $uri\r\nContent-Length: ${p.length}\r\n\r\n")
        .getBytes("US-ASCII") ++ p ++ "\r\n\r\n".getBytes("US-ASCII")
    val gif = Gif.encode(4, 4, 2,
      Array.tabulate(12)(i => (i * 19).toByte),
      Array.tabulate(16)(i => (i % 4).toByte))
    val png = Png.encode(4, 3,
      Array.tabulate(36)(i => (i * 7).toByte), _ => 0)
    val jpegish = Array(0xFF, 0xD8, 0xFF, 0xE0, 1, 2, 3).map(_.toByte)
    val wav = Wav.encode(8000, 1,
      Array.tabulate(16)(i => (i * 1000 - 8000).toShort))
    // A non-WAVE RIFF container (e.g. AVI) must NOT route as wav —
    // the sniff needs BOTH the RIFF magic and the WAVE form type.
    val avi = "RIFF".getBytes("US-ASCII") ++ Array[Byte](1, 0, 0, 0) ++
      "AVI LIST".getBytes("US-ASCII")
    val html = "<html><p>hello the world the</p></html>".getBytes("UTF-8")
    val bytes = recB("<urn:g>", "https://e.com/g.gif", gif) ++
      recB("<urn:p>", "https://e.com/p.png", png) ++
      recB("<urn:j>", "https://e.com/j.jpg", jpegish) ++
      recB("<urn:w>", "https://e.com/w.wav", wav) ++
      recB("<urn:a>", "https://e.com/a.avi", avi) ++
      recB("<urn:h>", "https://e.com/h", html)
    val dir = Files.createTempDirectory("graft_wmedia").toFile
    Files.write(new java.io.File(dir, "m.warc").toPath, bytes)
    val media = WarcCuratePipeline.mediaFrom(
        WarcSource.read(spark, dir.getAbsolutePath))
      .select("url", "format", "n_bytes", "payload")
      .as[(String, String, Long, Array[Byte])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(media.keySet == Set("https://e.com/g.gif",
      "https://e.com/p.png", "https://e.com/j.jpg",
      "https://e.com/w.wav"),
      "HTML and non-WAVE RIFF responses stay out of the media fork")
    assert(media("https://e.com/g.gif")._1 == "gif")
    assert(media("https://e.com/p.png")._1 == "png")
    assert(media("https://e.com/j.jpg")._1 == "jpeg")
    assert(media("https://e.com/w.wav")._1 == "wav")
    assert(media("https://e.com/g.gif")._2 == gif.length.toLong)
    // the routed bytes are intact: both codecs round-trip
    assert(Gif.decode(media("https://e.com/g.gif")._3).isDefined)
    val dec = Wav.decode(media("https://e.com/w.wav")._3)
    assert(dec.exists(d => d.sampleRate == 8000 &&
      d.samples.length == 16))
  }

  test("orc sink: same layout contract, filters push to the orc scan") {
    val dir = Files.createTempDirectory("graft_osink").toFile.getAbsolutePath
    val df = Seq(
      (1L, "2026-01-01", 30L), (2L, "2026-01-01", 10L),
      (3L, "2026-01-02", 20L), (4L, "2026-01-02", 5L))
      .toDF("id", "dt", "v")
    OrcSink.writePartitioned(df, dir, Seq("dt"), Seq("v"))

    val dirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("dt=")).sorted.toSeq
    assert(dirs == Seq("dt=2026-01-01", "dt=2026-01-02"))

    val back = OrcSink.read(spark, dir)
    assert(back.count() == 4)
    assert(back.filter(col("dt") === "2026-01-02")
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // Predicate pushdown reaches the ORC scan (stripe-skipping path),
    // exactly as PlanShapeSpec pins it for parquet.
    val p = back.filter(col("v") > 10).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(v), GreaterThan(v,10)"),
      s"orc scan lost filter pushdown\n$p")
  }

  test("nav index pipeline: the FreshDiskANN chain on files matches " +
      "the operator twins step for step") {
    import graft.operators.Similarity
    import graft.sources.NavIndexPipeline
    val idx = Files.createTempDirectory("graft_navidx").toFile
      .getAbsolutePath
    val all = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = all.filter(col("vec_id") < 400)
    val delta = all.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    def castD(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"),
        expr("transform(embedding, v -> cast(v as double))")
          .as("embedding"))
    def edgesOf(df: org.apache.spark.sql.DataFrame)
        : Set[(Long, Long, Long, Long)] =
      df.select(col("vec_id"), col("rank"), col("nbr_id"), col("sim_e6"))
        .as[(Long, Long, Long, Long)].collect().toSet

    // build == e28's operator composition, bit-for-bit (k-means is
    // deterministic, so re-running the twin reproduces the cells).
    val n0 = NavIndexPipeline.build(spark, base, idx,
      maxDegree = 8, maxCandidates = 16, perCell = 50, iters = 2)
    assert(n0 == 400L)
    val tc = Similarity.trainedCells(castD(base), perCell = 50, iters = 2)
      .persist()
    val builtMem = Similarity.navigableGraph(
        tc.select("vec_id", "embedding"),
        Similarity.knnGraphProbed(tc, "cell", k = 8, nprobe = 2)
          .select(col("vec_id"), col("nbr_id")),
        maxDegree = 8, maxCandidates = 16)
      .persist()
    assert(edgesOf(spark.read.parquet(s"$idx/graph")) == edgesOf(builtMem),
      "stored built graph diverges from navigableGraph")

    // attach == e32's insert (fwd lists + backlink debt appended).
    val nd = NavIndexPipeline.attach(spark, idx, delta,
      maxDegree = 8, maxCandidates = 16)
    assert(nd == 50L)
    val attMem = Similarity.navigableAttach(tc, castD(delta), "cell",
        maxDegree = 8, maxCandidates = 16)
      .persist()
    def attRows(df: org.apache.spark.sql.DataFrame)
        : Set[(Long, String, Option[Long], Long, Long)] =
      df.select(col("vec_id"), col("kind"), col("rank"), col("nbr_id"),
        col("sim_e6")).as[(Long, String, Option[Long], Long, Long)]
        .collect().toSet
    assert(attRows(spark.read.parquet(s"$idx/attach")) == attRows(attMem),
      "stored attach history diverges from navigableAttach")

    // health card over files == e51 over the in-memory artifacts —
    // and it must show debt (the compaction trigger is live).
    val cardGot = NavIndexPipeline.healthCard(spark, idx, maxDegree = 8)
      .collect().toSeq
    val cardWant = Similarity.navAttachHealth(
      tc.select("vec_id", "embedding"), builtMem, attMem, maxDegree = 8)
      .collect().toSeq
    assert(cardGot == cardWant, s"health card: $cardGot vs $cardWant")
    assert(cardGot.head.getAs[Long]("n_backlink_debt") > 0,
      "fixture must carry backlink debt or compaction tests nothing")

    // compact == e52 (attach folded, overflow re-pruned, history
    // truncated).
    NavIndexPipeline.compact(spark, idx, maxDegree = 8,
      maxCandidates = 16)
    val embAll = tc.select("vec_id", "embedding")
      .union(castD(delta)).persist()
    val compMem = Similarity.navCompact(embAll, builtMem, attMem,
        maxDegree = 8, maxCandidates = 16)
      .persist()
    assert(edgesOf(spark.read.parquet(s"$idx/graph")) == edgesOf(compMem),
      "stored compacted graph diverges from navCompact")
    assert(spark.read.parquet(s"$idx/attach").count() == 0,
      "compaction must truncate the attach history")

    // delete == e53 (tombstones reconnected through, every artifact
    // rewritten without them).
    val tomb = all.filter(col("vec_id") % 7 === 3 && col("vec_id") < 450)
      .select("vec_id")
    val nKept = NavIndexPipeline.delete(spark, idx, tomb,
      maxDegree = 8, maxCandidates = 16)
    val tombIds = tomb.as[Long].collect().toSet
    assert(nKept == 450L - tombIds.size)
    val delMem = Similarity.navDelete(embAll, compMem, tomb,
        maxDegree = 8, maxCandidates = 16)
      .persist()
    assert(edgesOf(spark.read.parquet(s"$idx/graph")) == edgesOf(delMem),
      "stored post-delete graph diverges from navDelete")
    val embIds = spark.read.parquet(s"$idx/emb")
      .select("vec_id").as[Long].collect().toSet
    assert(embIds.intersect(tombIds).isEmpty && embIds.size == nKept,
      "emb/ must drop exactly the tombstones")
    assert(spark.read.parquet(s"$idx/entries").select("cand_id")
      .as[Long].collect().toSet.intersect(tombIds).isEmpty,
      "entries/ must drop tombstoned medoids")

    // search over the final files == the beam walk over the in-memory
    // final graph — and every query comes back non-empty.
    val queries = all.filter(col("vec_id") < 5)
    val got = NavIndexPipeline.search(spark, idx, queries,
      beamWidth = 8, rounds = 3).collect().toSet
    val entriesMem = Similarity.cellMedoids(tc, "cell")
      .join(tomb.select(col("vec_id").as("cand_id")), Seq("cand_id"),
        "left_anti")
    val want = Similarity.graphBeamSearch(
      embAll.join(tomb, Seq("vec_id"), "left_anti"), castD(queries),
      delMem.select("vec_id", "nbr_id").distinct(), entriesMem,
      beamWidth = 8, rounds = 3).collect().toSet
    assert(got == want, "file-served search diverges from the walk twin")
    assert(got.map(_.getAs[Long]("query_id")) ==
      Set(0L, 1L, 2L, 3L, 4L), "every query must return results")
    Seq(tc, builtMem, attMem, embAll, compMem, delMem)
      .foreach(_.unpersist())
    spark.catalog.clearCache()
  }
}
