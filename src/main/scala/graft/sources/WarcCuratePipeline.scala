package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.operators.{CurationFunnel, HtmlExtract}

/** The crawl→corpus job: WARC shards in (plain or per-member gzip —
  * the Common Crawl layout) → HTML-extracted documents → the
  * oracle-verified d54 curation funnel → token-budgeted curated
  * shards + per-stage audit + parse quarantine. This is the FRONT
  * DOOR composition: every stage is an individually-verified
  * operator ([[WarcSource]], d31's `HtmlExtract`, `CurationFunnel`,
  * [[ParquetSink.writeTokenShards]]); the job only wires them, so
  * the runnable binary can't drift from the verified plans.
  *
  * Output layout:
  *   `<out>/corpus/shard=K/…` — surviving (doc_id, url, text,
  *     n_tokens) rows as ≈budget-token shards;
  *   `<out>/audit/` — the per-stage (stage, n_docs, n_tokens) table;
  *   `<out>/media/format=png|jpeg|gif|wav/` — image and audio
  *     responses routed by payload signature (bytes + typed
  *     metadata; decode downstream);
  *   `<out>/quarantine/` — malformed records / gzip members with
  *     file, offset, reason.
  *
  * Scale shape: the WARC scan is file-parallel (the crawl shard =
  * the task), extraction and document ids are map-side
  * (`xxhash64(record_id)` — content-derived, so re-crawls of the
  * same record collide onto one id and retries are deterministic),
  * and the funnel keeps its pinned gate plans. The one `.cache()`
  * lets records and quarantine split from a single parse pass.
  *
  * `spark-submit --class graft.sources.WarcCuratePipeline …
  * <warcDir> <outDir> [tokensPerShard]`.
  */
object WarcCuratePipeline {

  /** HTML-extracted documents from parsed WARC rows: one (doc_id,
    * url, text) row per non-empty `response` record.
    */
  def documentsFrom(parsed: DataFrame): DataFrame =
    WarcSource.records(parsed)
      .filter(col("warc_type") === "response")
      .select(
        xxhash64(col("record_id")).as("doc_id"),
        col("target_uri").as("url"),
        HtmlExtract.extract(col("payload").cast("string")).as("text"))
      .filter(length(trim(col("text"))) > 0)

  /** Media fork of the crawl: one (doc_id, url, format, n_bytes,
    * payload) row per response whose payload carries a known media
    * signature — PNG, JPEG, GIF (the image codec family) or WAV
    * (the audio family: RIFF container with a WAVE form type, the
    * m8/m21 decode path). Pure map-side routing on the payload's
    * magic bytes (the m6 sniff discipline); DECODE stays in the
    * downstream m7/m9/m17/m8 operators, so a corrupt file can't
    * fail the routing job.
    */
  def mediaFrom(parsed: DataFrame): DataFrame = {
    val sig = hex(substring(col("payload"), 1, 6))
    // RIFF sniff needs two non-contiguous spans: bytes 1-4 "RIFF"
    // and bytes 9-12 "WAVE" (5-8 are the chunk size — any value).
    val riff = hex(substring(col("payload"), 1, 4))
    val wave = hex(substring(col("payload"), 9, 4))
    WarcSource.records(parsed)
      .filter(col("warc_type") === "response")
      .withColumn("format",
        when(sig.startsWith("89504E47"), "png")
          .when(sig.startsWith("FFD8FF"), "jpeg")
          .when(sig === "474946383761" || sig === "474946383961", "gif")
          .when(riff === "52494646" && wave === "57415645", "wav"))
      .filter(col("format").isNotNull)
      .select(xxhash64(col("record_id")).as("doc_id"),
        col("target_uri").as("url"), col("format"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("payload"))
  }

  /** Runs crawl→corpus; returns (kept docs, audit rows) after
    * writing corpus, audit, media, and quarantine.
    */
  def run(spark: SparkSession, warcDir: String, outDir: String,
      tokensPerShard: Long = 1000000L): (Long, DataFrame) = {
    val parsed = WarcSource.read(spark, warcDir).cache()
    try {
      WarcSource.quarantine(parsed).write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/quarantine")
      mediaFrom(parsed).write.mode(SaveMode.Overwrite)
        .partitionBy("format").parquet(s"$outDir/media")
      val docs = documentsFrom(parsed)
      val st = CurationFunnel.stages(docs)
      val kept = st.last
        .join(docs.select("doc_id", "url"), "doc_id")
        .withColumn("n_tokens",
          size(expr(TextHash.sparkTokens("text"))).cast("long"))
      ParquetSink.writeTokenShards(kept, s"$outDir/corpus", "doc_id",
        "n_tokens", tokensPerShard)
      val audit = CurationFunnel.auditOf(docs, st).orderBy("stage_id")
      audit.write.mode(SaveMode.Overwrite).parquet(s"$outDir/audit")
      (spark.read.parquet(s"$outDir/corpus").count(), audit)
    } finally parsed.unpersist()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: WarcCuratePipeline <warcDir> <outDir> [tokensPerShard]")
    val spark = graft.GraftSession.local()
    try {
      val budget = if (args.length > 2) args(2).toLong else 1000000L
      val (n, audit) = run(spark, args(0), args(1), budget)
      println(s"kept $n docs")
      audit.show(truncate = false)
    } finally spark.stop()
  }
}
