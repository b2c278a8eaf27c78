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
    val drop3 = Dedup.ngramJaccardPairs(base2, minJaccard = 0.8)
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
    val tkn = docs0.select(col("doc_id"),
      size(expr(TextHash.sparkTokens("text"))).cast("long").as("nt"))
    def stat(df: DataFrame, id: Long, name: String): DataFrame =
      df.select("doc_id").join(tkn, "doc_id")
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum("nt"), lit(0L)).as("n_tokens"))
        .select(lit(id).as("stage_id"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    st.zip(StageNames).zipWithIndex
      .map { case ((df, name), i) => stat(df, i.toLong, name) }
      .reduce(_ unionByName _)
  }
}
