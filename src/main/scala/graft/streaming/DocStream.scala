package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.operators.PiiScrub

/** Structured Streaming twins of the document-pipeline surface
  * (SURVEY.md §2 block D): the curation steps a training corpus runs
  * continuously as new documents arrive.
  *
  * The stateless steps (PII scrub, quality gating) are literally the
  * batch definitions — a map-side column plan is source-agnostic, so
  * ONE definition serves both engines. The stateful step (exact
  * dedup) uses `dropDuplicatesWithinWatermark`, which keeps a key in
  * state only until the watermark passes it — bounded state on an
  * unbounded stream, unlike plain streaming `dropDuplicates` whose
  * key set grows forever.
  */
object DocStream {

  /** PII scrub over an arriving document stream — the batch
    * [[PiiScrub.scrub]] plan applied unchanged (stateless, append
    * mode, no watermark needed).
    */
  def scrubbed(docs: DataFrame): DataFrame =
    PiiScrub.scrub(docs)
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        col("scrubbed"))

  /** The d13 corpus-curation gate over an arriving stream — the batch
    * quality/language/length filters applied unchanged (stateless
    * map-side column math, append mode, no watermark needed). One
    * definition, two engines.
    */
  def qualityGated(docs: DataFrame, minScore: Double = 0.63,
      minTokens: Long = 20L, maxTokens: Long = 10000L): DataFrame =
    TextAnalysis.quality(docs)
      .filter(col("predicted") === "en" &&
        col("quality_score") >= minScore &&
        col("n_tokens").between(minTokens, maxTokens))
      .select(col("doc_id"),
        floor(col("quality_score") * 10000 + 0.5).cast("long")
          .as("quality_score_e4"))

  /** Streaming exact dedup: first arrival of each normalized-text key
    * survives; later copies arriving within `watermark` of event time
    * are dropped, and the key's state is reclaimed once the watermark
    * passes — the dedup window a continuously-ingesting corpus
    * actually wants (an exact forever-dedup belongs in the batch
    * compaction pass, d1).
    */
  def dedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .select(col("doc_id"), col("ingest_ts"),
        lower(trim(col("text"))).as("text_key"))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("text_key")
}
