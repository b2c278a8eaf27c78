package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Bucketed

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables sort-merge join with no exchange") {
    // Fresh location per run: the in-memory catalog forgets tables
    // between JVMs but their files persist, and CREATE refuses an
    // existing managed-table location.
    val wh = java.nio.file.Files.createTempDirectory("graft_bt_wh")
    spark.sql("DROP DATABASE IF EXISTS graft_bt CASCADE")
    spark.sql(s"CREATE DATABASE graft_bt LOCATION '$wh'")
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "a")
    val dims = (1 to 1000).map(i => (i.toLong % 50, i * 2.0)).toDF("k", "b")
    Bucketed.writeBucketed(facts, "graft_bt.f", "k", 8)
    Bucketed.writeBucketed(dims, "graft_bt.d", "k", 8)

    // MERGE hint keeps the small tables off the broadcast path so the
    // plan shows what bucketing buys a fact-fact join.
    val joined = spark.table("graft_bt.f").hint("merge")
      .join(spark.table("graft_bt.d"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == facts.join(dims, "k").count())
  }

  test("incremental LSH probes the bucketed corpus band table " +
      "with no corpus-side exchange") {
    // The d21 maintenance story, composed end-to-end: the corpus band
    // table is PERSISTED bucketed by (band, sig) — the candidate
    // join's composite key — so a daily delta probe shuffles only the
    // DELTA into the corpus's bucket layout and the corpus side is
    // read in place. At 100 TB the corpus-side shuffle is the
    // dominant cost of the naive plan; this pin proves it's gone.
    val wh = java.nio.file.Files.createTempDirectory("graft_lsh_wh")
    spark.sql("DROP DATABASE IF EXISTS graft_lsh CASCADE")
    spark.sql(s"CREATE DATABASE graft_lsh LOCATION '$wh'")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val delta = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    Bucketed.writeBucketed(Dedup.bandTable(Dedup.shingleSets(docs)),
      "graft_lsh.corpus_bands", Seq("band", "sig"), 8)
    val corpusBands = spark.table("graft_lsh.corpus_bands")
    val deltaBands = Dedup.bandTable(Dedup.shingleSets(delta))

    // AQE off for the plan surgery: the adaptive wrapper hides the
    // join subtrees until execution. Semantics are unaffected.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cand = Dedup.lshCandidates(deltaBands, corpusBands.hint("merge"))
      val smj = cand.queryExecution.executedPlan.collect {
        case j: SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "bucketed probe lost its sort-merge join:\n" +
        cand.queryExecution.executedPlan)
      def exchanges(p: SparkPlan) = p.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges(smj.head.right).isEmpty,
        "corpus side shuffled despite bucketing:\n" + smj.head.right)
      assert(exchanges(smj.head.left).nonEmpty,
        "expected the delta side to shuffle into the bucket layout:\n" +
          smj.head.left)
      // Parity: identical candidate set to the shuffle-both-sides path.
      val got = cand.as[(Long, Long)].collect().toSet
      val want = Dedup.lshCandidates(deltaBands,
        Dedup.bandTable(Dedup.shingleSets(docs))).as[(Long, Long)]
        .collect().toSet
      assert(got == want)
      assert(got.nonEmpty, "no LSH candidates at sf0.001 — test is vacuous")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
