package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline query set
  * (SURVEY.md §6) on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * One short warm-up job runs first so JVM/codegen startup cost is
  * not attributed to the first measured query; each headline query
  * then runs 6× end-to-end (1 cold + 5 steady), and the reported
  * `value` is the per-query MEDIAN of the steady runs — robust to
  * the box's documented co-tenant contention bursts, which min-of-2
  * (and, in round 6, even median-of-3) could not reject.
  *
  * Contention self-adjudication: a clean steady query has
  * median ≈ min; a co-tenant burst inflates some runs but not the
  * best one. If the steady median exceeds 1.5× the steady min, the
  * query re-runs (up to 4 extra rounds) until the spread closes or
  * the budget is spent, the median is taken over ALL steady runs,
  * and the query is flagged `contended` in the JSON — so a reader
  * can distinguish "slow plan" (median ≈ min, both high) from
  * "noisy box" (median ≫ min) without re-running by hand.
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
    "e8_ann_learned",
    // Round 8: the two newest families get gate representation —
    // the full curation funnel (gated stages, digest-keyed dedup,
    // decontamination, token budget) and the real-codec image path
    // (zlib+unfilter decode → dHash → group) — so a regression
    // there is no longer invisible to the bench.
    "d54_curation_funnel", "m10_image_dhash",
    // Round 9: filtered retrieval through the IVF probe path (the
    // production filtered-ANN shape: predicate inside the routed
    // cell scan) and the animated-GIF composited frame walk (the
    // heaviest codec path — LZW + per-frame compositing/disposal).
    "e24_filtered_ivf", "m19_gif_frames",
    // Round 10: the navigable-graph BUILD (symmetrize + heap
    // truncation + the greedy alpha-prune higher-order aggregate —
    // the heaviest new plan shape) and the audio VAD segmentation
    // (decode + resample + run-length scan — the audio family's
    // gate representative).
    "e28_nav_graph", "m23_vad_segments",
    // Round 12 widening (the round-11 verdict's ask): the filtered
    // graph-ANN walk (predicate below the gather join on the
    // heaviest search family — round 11's genuinely new plan shape)
    // and the full k-core decomposition (seeded peeling waves — the
    // heaviest round-11 graph plan).
    "e41_filtered_graph_ann", "g21_core_decomp",
    // Round 13 widening (the round-12 verdict's ask): bounded
    // deterministic Louvain (integer-argmax local moves +
    // contraction — the heaviest round-12 graph plan) and the
    // hierarchical navigable-graph build (per-level probed kNN +
    // the level-0 alpha-prune — the heaviest round-12 ANN plan).
    "g26_louvain", "e46_hier_graph",
    // Round 13 second widening: the PQ-GUIDED walk + exact rerank
    // (e49 — PQ training, map-side coding, reconstruction joins, the
    // beam walk over reconstructions, float rerank: the round's
    // heaviest new composition, and the one whose regression no
    // other headline query would surface).
    "e49_pq_nav",
    // Round 14 widening (the round-13 verdict's ask): the full
    // truss decomposition (iterated support peeling — the heaviest
    // round-13 graph plan) and the CCNet perplexity terciles (the
    // KN bigram LM chain + percentile split — the heaviest
    // round-13 text plan).
    "g33_truss_decomp", "d78_ccnet_buckets",
    // Round 15 widening: the selective nav-graph compaction (build +
    // attach + merged-list re-prune — the round's heaviest
    // maintenance composition) and the unigram-LM tokenizer trainer
    // (three enumeration E-steps + the loss prune — the heaviest
    // round-15 text plan).
    "e52_nav_compact", "d83_unigram_lm",
    // Round 16 widening (the round-15 verdict's ask): the nav-graph
    // delete+consolidate (e53 — the heaviest round-15 shape that was
    // not yet at the gate: tombstone reconnection through deleted
    // out-lists + the overflow re-prune) and the unigram-LM corpus
    // stats (d84 — the d53-evaluation feed, a second E-step shape
    // over the trained pieces).
    "e53_nav_delete", "d84_unigram_stats")

  /** Per-query quiet-box gate rows (sf0.1 cross-run steady medians,
    * BASELINE.md round-14 record) — the CURRENT reference the run
    * adjudicates itself against. The round-13 verdict's finding:
    * within-run spread (median vs own min) catches bursts but not
    * SUSTAINED co-tenant load that inflates every query uniformly —
    * BENCH_r13 shipped 1.26× of gate with zero contended flags.
    * The fix: compare the run's gated total against these rows and
    * re-run the whole set once when it exceeds [[GateInflated]];
    * the JSON carries gate_total/gate_ratio/inflated either way, so
    * a reader can adjudicate an artifact without bench_quiet/
    * cross-referencing. Rows are re-recorded when a plan changes
    * (protocol in BASELINE.md); queries without a row (new or
    * just-changed plans, pre-record) simply don't enter the ratio.
    */
  val gate: Map[String, Double] = Map(
    // Round-14 quiet-box rows: cross-run medians of
    // bench_quiet/r14_sf01_run{1,2,3}.json (zero contended flags;
    // gate ratios 0.86-0.93 vs the round-13 rows), d54 from its
    // post-positional-filter re-runs (BASELINE.md round-14).
    "pr_ranks" -> 3.75, "q1_agg" -> 0.35, "q3_topk_join" -> 0.56,
    "q18_sessionize" -> 0.67, "d3_minhash_lsh" -> 0.43,
    "e1_ann_topk" -> 0.46, "e6_knn_graph" -> 1.24,
    "d10_embed_dedup" -> 0.68, "q21_asof_join" -> 0.49,
    "pr_wiki_ranks" -> 2.59, "e8_ann_learned" -> 1.27,
    "d54_curation_funnel" -> 6.51, "m10_image_dhash" -> 0.50,
    "e24_filtered_ivf" -> 0.56, "m19_gif_frames" -> 0.86,
    "e28_nav_graph" -> 4.90, "m23_vad_segments" -> 0.22,
    "e41_filtered_graph_ann" -> 6.05, "g21_core_decomp" -> 2.87,
    "g26_louvain" -> 6.26, "e46_hier_graph" -> 7.69,
    "e49_pq_nav" -> 7.33, "g33_truss_decomp" -> 3.47,
    "d78_ccnet_buckets" -> 1.47,
    // Round-15 quiet-box rows (BENCH_r15, 5 steady runs, gate_ratio
    // 1.048 run) for the queries round 15 added to the headline set.
    // e53/d84 enter the gate once this round's sf0.1 cross-run
    // medians are recorded (new rows simply don't join the ratio
    // until then, per the documented protocol).
    "e52_nav_compact" -> 6.32, "d83_unigram_lm" -> 3.64)

  /** Run-total-vs-gate threshold above which the set re-runs once
    * and, failing again, the JSON self-flags `inflated`. */
  val GateInflated = 1.3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark: SparkSession = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: small end-to-end job (scan + agg + shuffle) to load
    // parquet reader, codegen and shuffle machinery.
    SparkEntry.queries("q1_agg")(spark, sfDir).collect()

    // Six timed runs per query: run 1 is cold (includes scan,
    // signature computation, first-time AQE planning); runs 2-6 are
    // steady-state — operators that persist their invariant side
    // (PageRank's partitioned edges, LSH's shingle sets) legitimately
    // reuse it, which is the "partition once, iterate" design claim.
    // The headline value is the MEDIAN of the steady runs (order
    // statistic at size/2 — the upper middle for even sizes), with
    // the contention self-adjudication loop documented above. Min
    // and cold ship alongside for transparency.
    case class R(name: String, median: Double, min: Double, cold: Double,
        nSteady: Int, contended: Boolean, spillMb: Long, peakExecMb: Long,
        rssHwmMb: Long)
    // Memory-pressure instrumentation (round-15 verdict): the nav
    // family's 101 GB RSS / cold-617 s signal and the sf10 probes'
    // disk exhaustion both needed numbers the JSON didn't carry.
    // A task listener accumulates shuffle/agg SPILL bytes and the
    // max per-task peak execution memory; per query the run records
    // the spill DELTA, the peak over its own tasks, and the
    // process's RSS high-water mark (/proc/self/status VmHWM) after
    // the query — monotone, so the query that pushes it is visible.
    // Listener events are async; the snapshot sleeps briefly after
    // the last run, so the numbers are best-effort (documented) —
    // the signal wanted is GB-scale, not byte-exact.
    val spillBytes = new java.util.concurrent.atomic.AtomicLong
    val peakTaskMem = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            spillBytes.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
            peakTaskMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
          }
        }
      })
    def rssHwmMb(): Long = {
      try {
        val src = scala.io.Source.fromFile("/proc/self/status")
        try src.getLines().find(_.startsWith("VmHWM:"))
          .map(_.replaceAll("[^0-9]", "").toLong / 1024).getOrElse(-1L)
        finally src.close()
      } catch { case _: Exception => -1L }
    }
    // SPARK_GRAFT_BENCH_SKIP: comma-separated headline names to
    // exclude — the dev knob for scale-sweep subsets (the sf3+ step
    // excludes the three label-blocked probed-kNN builds whose
    // deliberate fixed-grid substrate is documented in BASELINE.md;
    // the driver never sets this, so gate runs always time the full
    // set). The JSON records the skip so a partial run cannot read
    // as full coverage.
    val skip = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // SPARK_GRAFT_BENCH_EXTRA: comma-separated non-headline names
    // APPENDED to the run — the dev knob for scale probes of new
    // operators (the driver never sets it; like skip, the JSON
    // records it so an augmented run cannot read as the gate set).
    val extraRaw = sys.env.get("SPARK_GRAFT_BENCH_EXTRA")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty[String])
      .filterNot(headline.contains)
      .distinct
    // Unknown names drop with a warning instead of crashing the run
    // mid-bench (and duplicates above would double-emit JSON rows).
    val (extra, unknown) = extraRaw.partition(SparkEntry.queries.contains)
    unknown.foreach(n => System.err.println(
      s"[bench] WARNING: unknown SPARK_GRAFT_BENCH_EXTRA name '$n' " +
        "dropped (not a SparkEntry.queries key)"))
    val names = headline.filterNot(skip) ++ extra
    // SPARK_GRAFT_BENCH_RUNS: steady-run count override (default 5)
    // — the dev knob for one-shot scale probes (an sf10 decade point
    // doesn't need 6 runs per query; the slope table wants one warm
    // number). Like skip/extra, a non-default value is recorded in
    // the JSON so a reduced-protocol run can't read as a gate run.
    // toIntOption + warn: a malformed value must not crash an
    // hours-long scale probe (the SPARK_GRAFT_BENCH_EXTRA contract).
    val steadyRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS") match {
      case Some(v) => v.trim.toIntOption.map(_.max(1)).getOrElse {
        System.err.println(
          s"[bench] WARNING: SPARK_GRAFT_BENCH_RUNS '$v' is not an " +
            "int - using the default 5")
        5
      }
      case None => 5
    }
    def benchOne(name: String): R = {
      def run(): Double = {
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
      val spill0 = spillBytes.get()
      peakTaskMem.set(0L)
      val cold = run()
      val steady = scala.collection.mutable.ArrayBuffer.fill(steadyRuns)(run())
      def median = steady.sorted.apply(steady.size / 2)
      var extraRounds = 0
      while (extraRounds < 4 && median > 1.5 * steady.min) {
        steady += run()
        extraRounds += 1
      }
      val contended = median > 1.5 * steady.min
      // Deterministic inter-query cleanup (guide §1: time the query,
      // not the previous one's garbage): ContextCleaner releases a
      // finished run's localCheckpoint blocks / broadcasts only after
      // a GC notices the dead weak refs, and on a large heap that can
      // lag MANY queries behind — measured on the 28-query sf0.1 set:
      // e41's median read 16.4 s mid-set vs 6.8 s in a fresh JVM at
      // identical code, with the JVM RSS climbing monotonically. One
      // explicit GC per QUERY (never inside a timed run; timing
      // windows are untouched) keeps every query's runs in the same
      // JVM state its isolated measurement sees.
      System.gc()
      Thread.sleep(150) // let the async listener/cleaner queues drain
      val spillMb = (spillBytes.get() - spill0) / (1024 * 1024)
      val peakMb = peakTaskMem.get() / (1024 * 1024)
      val hwm = rssHwmMb()
      System.err.println(
        f"[bench] $name%-16s median $median%8.3f s  min ${steady.min}%.3f" +
          f"  cold $cold%.3f  (${steady.size} steady runs" +
          (if (contended) ", STILL CONTENDED)" else ")") +
          f"  spill ${spillMb}MB peakTask ${peakMb}MB rssHwm ${hwm}MB")
      R(name, median, steady.min, cold, steady.size, contended,
        spillMb, peakMb, hwm)
    }
    // Gate adjudication (round-13 verdict): within-run spread only
    // catches bursts; SUSTAINED co-tenant load inflates every query
    // uniformly and the run still shows zero contended flags. So the
    // run compares its gated total against the recorded quiet-box
    // rows and re-runs the whole set ONCE when > GateInflated×; if
    // the re-run is still inflated the JSON self-flags, and either
    // way the ratio ships in the artifact.
    // The gate rows are sf0.1 quiet-box medians — adjudication only
    // means anything on that corpus; a scale probe (sf1/sf10 via
    // SPARK_GRAFT_SF_DIR) would read 4-30x of gate and pay a
    // pointless full re-run.
    // Exact basename match (round-15 advice): a substring test would
    // adjudicate sf0.15/sf0.12-style paths — any directory merely
    // CONTAINING "sf0.1" — against sf0.1 quiet-box medians and pay a
    // pointless full re-run on a corpus the rows don't describe.
    val atGateSf = new java.io.File(sfDir).getName == "sf0.1"
    def gateRatio(rs: Seq[R]): Option[Double] = {
      val g = rs.filter(r => gate.contains(r.name))
      if (g.isEmpty || !atGateSf) None
      else Some(g.map(_.median).sum / g.map(r => gate(r.name)).sum)
    }
    var results = names.map(benchOne)
    if (gateRatio(results).exists(_ > GateInflated)) {
      System.err.println(
        f"[bench] gated total ${gateRatio(results).get}%.2fx of the " +
          "quiet-box gate rows - re-running the full set once")
      val second = names.map(benchOne)
      if (gateRatio(second).get < gateRatio(results).get)
        results = second
    }
    val ratio = gateRatio(results)
    val inflated = ratio.exists(_ > GateInflated)
    def jmap(f: R => String) =
      results.map(r => "\"" + r.name + "\":" + f(r)).mkString("{", ",", "}")
    val total = results.map(_.median).sum
    val totalMin = results.map(_.min).sum
    val totalCold = results.map(_.cold).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${jmap(_.median.toString)},"total_min":$totalMin,""" +
      s""""queries_min":${jmap(_.min.toString)},"total_cold":$totalCold,""" +
      s""""queries_cold":${jmap(_.cold.toString)},""" +
      s""""queries_runs":${jmap(_.nSteady.toString)},""" +
      s""""queries_contended":${jmap(_.contended.toString)},""" +
      s""""queries_spill_mb":${jmap(_.spillMb.toString)},""" +
      s""""queries_peak_task_mb":${jmap(_.peakExecMb.toString)},""" +
      s""""queries_rss_hwm_mb":${jmap(_.rssHwmMb.toString)},""" +
      ratio.fold("") { rr =>
        val gated = results.filter(r => gate.contains(r.name))
        val gt = gated.map(r => gate(r.name)).sum
        // Per-query ratios (round-14 verdict): the summed total can't
        // distinguish a localized plan regression from uniform
        // co-tenant inflation — ship each query's median/gate ratio
        // and the worst one so a reader adjudicates from the artifact.
        // Locale-proof 3-decimal rendering: the f"%.3f" interpolator
        // is JVM-default-locale-dependent (decimal COMMAS under e.g.
        // de_DE would corrupt the JSON); round-then-toString always
        // emits a dot.
        def r3(x: Double): String = ((x * 1000).round / 1000.0).toString
        val perQ = gated.map(r =>
          "\"" + r.name + "\":" + r3(r.median / gate(r.name)))
          .mkString("{", ",", "}")
        val worst = gated.maxBy(r => r.median / gate(r.name))
        s""""gate_total":$gt,"gate_ratio":$rr,"inflated":$inflated,""" +
          s""""queries_gate_ratio":$perQ,""" +
          s""""gate_ratio_max":${r3(worst.median / gate(worst.name))},""" +
          s""""gate_ratio_max_query":"${worst.name}","""
      } +
      (if (skip.isEmpty) ""
       else s""""skipped":[${skip.toSeq.sorted
         .map("\"" + _ + "\"").mkString(",")}],""") +
      (if (extra.isEmpty) ""
       else s""""extra":[${extra.sorted
         .map("\"" + _ + "\"").mkString(",")}],""") +
      (if (steadyRuns == 5) ""
       else s""""steady_runs_cfg":$steadyRuns,""") +
      s""""sf":"$sfDir"}"""
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
