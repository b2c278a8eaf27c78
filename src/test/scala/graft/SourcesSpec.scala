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
}
