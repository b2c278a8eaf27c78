package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.operators.Checkpointing.CutOps

/** The curation funnel as a reusable operator (SURVEY.md §2
  * `d54_curation_funnel`): the engine's individually-verified gates
  * chained in the standard order — rule filter, then dedup on the
  * survivors, then decontamination — with the per-stage audit table
  * every real curation run publishes. The oracle-checked d54 query
  * and the file→file job (graft.sources.CuratePipeline) both run
  * THIS definition, so the runnable binary can't drift from the
  * verified plan.
  *
  * Scale shape: every stage keeps its pinned standalone plan
  * (map-side rules, partial-agg keep-min, df-capped inverted-index
  * join, broadcast probe join); the composition adds only doc_id
  * semi/anti joins between stages and one-row aggregates for the
  * audit.
  */
object CurationFunnel {

  /** Stage names in funnel order. */
  val StageNames: Seq[String] =
    Seq("raw", "rules", "exact_dedup", "near_dedup", "decontam")

  /** The survivor set after each gate, each stage carrying (doc_id,
    * text). Head is the raw input; each subsequent frame consumes
    * the previous stage's survivors.
    *
    * Each gate's survivor ID SET is eagerly localCheckpointed (an
    * O(survivors) id list — bounded narrow state, the KMeans
    * precedent): every gate runs ONCE no matter how many downstream
    * consumers read its stage — without this, the audit's five
    * aggregates and the writer would each re-run the whole gate
    * chain prefix, a 5× recomputation that compounds at corpus
    * scale. Lineage also stays one gate deep instead of
    * funnel-deep.
    */
  def stages(docs0: DataFrame): Seq[DataFrame] = {
    val docs = docs0.select("doc_id", "text")
    val s1 = TextAnalysis.gopherRules(docs)
      .filter(col("pass") === 1).select("doc_id")
      .lineageCut
    val base1 = docs.join(s1, "doc_id")
    // Digest key, not the text itself: the exchange carries 16-byte
    // md5 digests instead of the corpus's distinct text (the
    // Dedup.exactDupGroups / lineDedup idiom).
    val keepEx = base1
      .groupBy(md5(lower(trim(col("text")))).as("ndigest"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
      .lineageCut
    val base2 = docs.join(keepEx, "doc_id")
    // Saturation-guarded near-dup gate (Dedup.nearDupPairsAuto): the
    // exact inverted-index path while the shingle vocabulary prunes,
    // the df-independent MinHash-LSH path once mean shingle df
    // approaches the cap — the d54 oracle mirrors the direct path,
    // which is what the router picks at every correctness SF, and
    // OperatorsSpec pins route-equality on both regimes.
    val drop3 = Dedup.nearDupPairsAuto(base2, minJaccard = 0.8)
      .select(col("db").as("doc_id")).distinct()
    val s3 = base2.select("doc_id")
      .join(drop3, Seq("doc_id"), "left_anti")
      .lineageCut
    val base3 = docs.join(s3, "doc_id")
    val normE = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val probes = docs
      .select(col("doc_id"), normE.as("norm"))
      .filter(col("doc_id") % 50 === 0 &&
        size(split(col("norm"), " ")) >= 10)
      .select(col("doc_id").as("probe_src"),
        expr("array_join(slice(split(norm, ' '), 3, 8), ' ')")
          .as("probe"))
    val corpus3 = base3.select(col("doc_id"), normE.as("norm"))
    val hit4 = Decontaminate.matches(corpus3, probes, n = 8)
      .select("doc_id").distinct()
    val s4 = base3.select("doc_id")
      .join(hit4, Seq("doc_id"), "left_anti")
      .lineageCut
    val base4 = docs.join(s4, "doc_id")
    Seq(docs, base1, base2, base3, base4)
  }

  /** The per-stage audit table: (stage_id, stage, n_docs, n_tokens),
    * token counts under the shared whitespace tokenizer.
    */
  def audit(docs0: DataFrame): DataFrame =
    auditOf(docs0, stages(docs0))

  /** Audit from PRECOMPUTED stages: callers that also consume the
    * survivors (e.g. the CuratePipeline writer) must build
    * [[stages]] once and pass it here — calling [[audit]] as well
    * would run every localCheckpointed gate a second time.
    */
  def auditOf(docs0: DataFrame, st: Seq[DataFrame]): DataFrame = {
    val spark = docs0.sparkSession
    import spark.implicits._
    // ONE tokenization pass: tag every stage's (checkpointed) id list
    // with its stage id, join the token counts once, aggregate once —
    // the per-stage-aggregate form re-tokenized the corpus five
    // times (once per stat job), which is the expensive step at
    // 100 TB. A stage spine left-join keeps the contract that empty
    // stages still emit a (0, 0) row.
    val tkn = docs0.select(col("doc_id"),
      size(expr(TextHash.sparkTokens("text"))).cast("long").as("nt"))
    val members = st.zipWithIndex.map { case (df, i) =>
      df.select(col("doc_id"), lit(i.toLong).as("stage_id"))
    }.reduce(_ unionByName _)
    val agged = members.join(tkn, "doc_id")
      .groupBy("stage_id")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
    StageNames.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("stage_id", "stage")
      .join(agged, Seq("stage_id"), "left")
      .select(col("stage_id"), col("stage"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
