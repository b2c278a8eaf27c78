package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.PiiScrub
import graft.streaming.DocStream

/** CONTINUOUS curation as a deployable job: a parquet directory is
  * the ingestion surface (new files appear as upstream drops them),
  * and each run drains everything new through the stateless curation
  * gates — quality/language/length (DocStream.qualityGatedFull, the
  * d13 plan) then PII scrub (the d11 plan) — into an append-only
  * curated parquet sink.
  *
  * `Trigger.AvailableNow` + the checkpoint make the job
  * BATCH-INCREMENTAL: it processes exactly the files not yet seen by
  * this checkpoint and exits, so a scheduler can run it like a batch
  * job while keeping streaming's exactly-once file-sink semantics —
  * re-running after new files arrive appends ONLY their curated rows
  * (restart-and-resume is spec-checked in DocStreamSpec). The same
  * code with a processing-time trigger is the always-on form.
  *
  * Stateless end to end — no watermark, no state store growth; the
  * stateful twins (windowed dedup, incremental near-dup) layer on
  * the same scaffold with their documented state bounds.
  */
object StreamCuratePipeline {

  /** Drain everything new under `inDir` through the gates into
    * `outDir`; blocks until this increment is fully processed.
    *
    * `schema`: pass the corpus schema explicitly for a scheduled
    * deployment — the default probes `inDir` for it, which cannot
    * work when the upstream has not dropped its first files yet. With
    * an explicit (or probe-able) schema, an empty or missing `inDir`
    * is a NO-OP increment (the file source lists zero new files), not
    * a failure — first runs of a batch-incremental schedule are
    * expected to race the producer.
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, minScore: Double = 0.63,
      minTokens: Long = 20L, maxTokens: Long = 10000L,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    val sch = schema.orElse(SourceSchemas.probe(spark, inDir)) match {
      case Some(s) => s
      case None => return // nothing upstream yet: no-op increment
    }
    val in = spark.readStream.schema(sch).parquet(inDir)
    val gated = DocStream.qualityGatedFull(in, minScore, minTokens,
      maxTokens)
    val curated = PiiScrub.scrub(gated)
      .select(col("doc_id"),
        floor(col("quality_score") * 10000 + 0.5).cast("long")
          .as("quality_score_e4"),
        col("n_emails"), col("n_phones"),
        col("scrubbed").as("text"))
    val q = curated.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: StreamCuratePipeline <inDir> <outDir> <checkpointDir>")
    val spark = graft.GraftSession.local()
    try run(spark, args(0), args(1), args(2))
    finally spark.stop()
  }
}
