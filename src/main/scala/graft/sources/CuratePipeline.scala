package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.operators.CurationFunnel

/** The file→file CURATION job — the runnable counterpart of
  * [[WikiPageRankPipeline]] for the training-data surface: parquet
  * corpus in → curated token-budgeted shards + audit table out,
  * running exactly the oracle-verified d54 funnel
  * (graft.operators.CurationFunnel — one definition, so the binary
  * can't drift from the verified plan).
  *
  * Output layout:
  *   `<out>/corpus/shard=K/…` — surviving docs as ≈budget-token
  *     shards ([[ParquetSink.writeTokenShards]]);
  *   `<out>/audit/` — the per-stage (stage, n_docs, n_tokens) table.
  *
  * `spark-submit --class graft.sources.CuratePipeline … <in> <out>
  * [tokensPerShard]` where `<in>` holds `documents.parquet`.
  */
object CuratePipeline {

  /** Runs the funnel; returns (kept docs, audit rows) after writing
    * both outputs.
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
      tokensPerShard: Long = 1000000L): (Long, DataFrame) = {
    val docs = spark.read.parquet(s"$inDir/documents.parquet")
    // Build the funnel ONCE and derive both the corpus write and the
    // audit from the same stage frames: each gate's survivor set is
    // localCheckpointed on first evaluation, so a second
    // CurationFunnel.stages/audit call would re-run every gate.
    val st = CurationFunnel.stages(docs)
    val kept = st.last
      .withColumn("n_tokens",
        size(expr(TextHash.sparkTokens("text"))).cast("long"))
    ParquetSink.writeTokenShards(kept, s"$outDir/corpus", "doc_id",
      "n_tokens", tokensPerShard)
    val audit = CurationFunnel.auditOf(docs, st).orderBy("stage_id")
    audit.write.mode(SaveMode.Overwrite).parquet(s"$outDir/audit")
    (spark.read.parquet(s"$outDir/corpus").count(), audit)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CuratePipeline <inDir> <outDir> [tokensPerShard]")
    val spark = graft.GraftSession.local()
    try {
      val budget =
        if (args.length > 2) args(2).toLong else 1000000L
      val (n, audit) = run(spark, args(0), args(1), budget)
      println(s"kept $n docs")
      audit.show(truncate = false)
    } finally spark.stop()
  }
}
