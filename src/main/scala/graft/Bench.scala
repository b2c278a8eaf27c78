package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline query set
  * (SURVEY.md §6) on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * One short warm-up job runs first so JVM/codegen startup cost is
  * not attributed to the first measured query; each headline query
  * then runs 4× end-to-end (1 cold + 3 steady), and the reported
  * `value` is the per-query MEDIAN of the steady runs — robust to
  * the box's documented co-tenant contention bursts, which min-of-2
  * could not reject.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "pr_ranks", "q1_agg", "q3_topk_join", "q18_sessionize",
    "d3_minhash_lsh", "e1_ann_topk",
    // One representative per newer family, so regressions in the
    // round-3/4/5 operators are visible to the gate (BASELINE.md
    // carries their medians): bulk kNN graph, hyperplane-LSH
    // embedding dedup, sort-merge as-of join, the full reference
    // pipeline with exact page semantics, and (since round 6) the
    // label-free IVF stack end-to-end — k-means training, the
    // compiled nearest-centroid assignment, and the learned-cell
    // probe, none of which the other nine queries exercise.
    "e6_knn_graph", "d10_embed_dedup", "q21_asof_join", "pr_wiki_ranks",
    "e8_ann_learned")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark: SparkSession = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: small end-to-end job (scan + agg + shuffle) to load
    // parquet reader, codegen and shuffle machinery.
    SparkEntry.queries("q1_agg")(spark, sfDir).collect()

    // Four timed runs per query: run 1 is cold (includes scan,
    // signature computation, first-time AQE planning); runs 2-4 are
    // steady-state — operators that persist their invariant side
    // (PageRank's partitioned edges, LSH's shingle sets) legitimately
    // reuse it, which is the "partition once, iterate" design claim.
    // The headline value is the MEDIAN of the three steady runs:
    // min-of-2 could not reject a co-tenant contention burst spanning
    // both runs (the round-5 recorded bench was a 2.44× artifact of
    // exactly that), while a median needs 2 of 3 runs corrupted to
    // move. Min and cold ship alongside for transparency.
    val results = headline.map { name =>
      val secs = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        // toRdd, not count(): under a bare count() Catalyst prunes
        // every computed column — and with distinct-key propagation
        // the rank queries' joins-against-aggregates get ELIMINATED,
        // so count() was timing a node-list scan, not 10 PageRank
        // iterations. toRdd materializes every output column: the
        // honest cost of producing the query's actual result.
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val steady = secs.drop(1)
      val median = steady.sorted.apply(steady.size / 2)
      System.err.println(
        f"[bench] $name%-16s median $median%8.3f s  (runs: ${
          secs.map(s => f"$s%.3f").mkString(", ")})")
      (name, median, steady.min, secs.head)
    }
    def jmap(f: ((String, Double, Double, Double)) => Double) =
      results.map(r => "\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalMin = results.map(_._3).sum
    val totalCold = results.map(_._4).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${jmap(_._2)},"total_min":$totalMin,""" +
      s""""queries_min":${jmap(_._3)},"total_cold":$totalCold,""" +
      s""""queries_cold":${jmap(_._4)},"sf":"$sfDir"}"""
    // The JSON must survive sbt's [info]-prefixed stdout wrapping:
    // write it to a file too, and stop Spark BEFORE printing so the
    // line is the final stdout of the run, not buried under shutdown
    // logging.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")), json)
    spark.stop()
    println(json)
  }
}
