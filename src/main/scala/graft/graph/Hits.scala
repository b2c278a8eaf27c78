package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Checkpointing.CutOps

/** HITS (hubs & authorities) over a directed `edges(src, dst)` list —
  * the query-dependent ranking sibling of [[PageRank]] (Kleinberg's
  * algorithm; the reference's rank family generalized to the
  * two-score mutual recursion): a good HUB points at good
  * authorities, a good AUTHORITY is pointed at by good hubs. On the
  * word-follow graph authorities are the "landing" words that many
  * well-connected words precede; for crawl/link corpora this is the
  * classic link-spam / topic-distillation primitive.
  *
  * Semantics (the oracle-checkable bounded form; mirrors the unrolled
  * SQL CTE chain in PageRankQueries.g9):
  *   - auth⁰ = hub⁰ = 1 for every node;
  *   - each iteration, in order:
  *       auth'(v) = Σ_{(u,v)∈E} hub(u), then L1-normalize:
  *       auth(v)  = auth'(v) / Σ_w auth'(w);
  *       hub'(u)  = Σ_{(u,v)∈E} auth(v), then L1-normalize.
  *     (L1 rather than L2 keeps the normalizer a plain partial-agg
  *     sum — no sqrt — and is the variant whose fixpoint differs only
  *     by scale.)
  *   - nodes with no in-edges hold auth 0; no out-edges, hub 0.
  *
  * Scale design (100 TB edges / 1000 executors):
  *   - The edge list is persisted TWICE, hash-partitioned by `src`
  *     and by `dst` — the auth half-step joins hubs on `src` against
  *     the src-partitioned copy, the hub half-step joins auths on
  *     `dst` against the dst-partitioned copy, so each half-step
  *     shuffles only the O(|V|) score table, never the edge set.
  *   - Contribution sums are partial-aggregated (map-side combine)
  *     before their exchange.
  *   - Each normalizer is a ONE-ROW aggregate broadcast back into the
  *     update (the PageRank dangling-mass pattern) — no driver
  *     round-trip, no collect.
  *   - The normalized auth frame is consumed twice per iteration
  *     (hub half-step + the joined score frame), so it is cut
  *     eagerly each round — without the cut the lazy plan DOUBLES
  *     per iteration (the PageRank conserving-branch lesson). The
  *     cut honors the session's reliable-checkpoint switch.
  */
object Hits {

  /** @param edges DataFrame with `src`, `dst` columns (any type).
    * @return DataFrame(node, auth, hub) for every node in `edges`.
    */
  def run(edges: DataFrame, iterations: Int = 8): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    val e = edges.select("src", "dst").distinct()

    val bySrc = e.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val byDst = e.repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    try {
      var scores = nodes
        .withColumn("auth", lit(1.0))
        .withColumn("hub", lit(1.0))
      for (i <- 1 to iterations) {
        // auth half-step: pull hub mass along edges, L1-normalize.
        val aRaw = bySrc
          .join(scores.select(col("node"), col("hub")),
            bySrc("src") === col("node"))
          .groupBy(bySrc("dst").as("node"))
          .agg(sum("hub").as("a_raw"))
        val aNorm = aRaw.agg(sum("a_raw").as("_na"))
        val auths = nodes.join(aRaw, Seq("node"), "left")
          .crossJoin(broadcast(aNorm))
          .select(col("node"),
            (coalesce(col("a_raw"), lit(0.0)) / col("_na")).as("auth"))

        // `auths` is consumed TWICE below (hub half-step + the joined
        // score frame), so the lazy plan would double per iteration —
        // the PageRank conserving-branch lesson: cut the O(|V|) frame
        // eagerly, one small job per round.
        val authsCut = auths.lineageCut

        // hub half-step: pull the JUST-normalized auth mass back.
        val hRaw = byDst
          .join(authsCut.select(col("node"), col("auth")),
            byDst("dst") === col("node"))
          .groupBy(byDst("src").as("node"))
          .agg(sum("auth").as("h_raw"))
        val hNorm = hRaw.agg(sum("h_raw").as("_nh"))
        val hubs = nodes.join(hRaw, Seq("node"), "left")
          .crossJoin(broadcast(hNorm))
          .select(col("node"),
            (coalesce(col("h_raw"), lit(0.0)) / col("_nh")).as("hub"))

        scores = authsCut.join(hubs, "node")
      }
      scores.lineageCut
    } finally {
      bySrc.unpersist(blocking = false)
      byDst.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
  }

  /** Convergence twin of [[run]] (the PageRank.runUntilConverged /
    * KCore.untilStable house pattern): iterate until the L1 delta of
    * the auth vector between consecutive iterations drops under
    * `tol` — ONE O(1) driver scalar per round — then return the
    * stabilized scores with the iteration count. Throws rather than
    * returning an unconverged ranking.
    */
  def runUntilConverged(edges: DataFrame, tol: Double = 1e-9,
      maxIterations: Int = 200): (DataFrame, Int) = {
    require(tol > 0, s"tol must be > 0, got $tol")
    // The loop's static sides persist ONCE — the run() shape; without
    // this every step would re-shuffle the full edge set four ways.
    val e = edges.select("src", "dst").distinct()
    val bySrc = e.repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val byDst = e.repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Seed from the loop's OWN persisted copies — run(edges, 1)
      // would independently re-derive, re-shuffle and re-persist the
      // same distinct edge/node sets, paying the full edge shuffle
      // twice for the first iteration.
      val init = nodes
        .withColumn("auth", lit(1.0))
        .withColumn("hub", lit(1.0))
      var prev = step(bySrc, byDst, nodes, init)
      var it = 1
      var done = false
      while (!done && it < maxIterations) {
        val next = step(bySrc, byDst, nodes, prev)
        val delta = next.select(col("node"), col("auth"))
          .join(prev.select(col("node"), col("auth").as("pa")), "node")
          .agg(coalesce(sum(abs(col("auth") - col("pa"))), lit(0.0)))
          .head().getDouble(0)
        prev = next
        it += 1
        done = delta < tol
      }
      require(done, s"HITS did not converge in $maxIterations iterations")
      // Eager cut before the finally releases the loop caches — the
      // returned frame must not lazily re-derive the unpersisted
      // edge copies (the PageRank.runUntilConverged contract).
      (prev.lineageCut, it)
    } finally {
      bySrc.unpersist(blocking = false)
      byDst.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
  }

  /** One HITS iteration continuing from an existing (node, auth,
    * hub) frame — the [[runUntilConverged]] step, against the
    * loop's persisted per-join-key edge copies and node set so each
    * round shuffles only the O(|V|) carry.
    */
  private def step(bySrc: DataFrame, byDst: DataFrame, nodes: DataFrame,
      scores: DataFrame): DataFrame = {
    val aRaw = bySrc
      .join(scores.select(col("node"), col("hub")),
        bySrc("src") === col("node"))
      .groupBy(bySrc("dst").as("node"))
      .agg(sum("hub").as("a_raw"))
    val aNorm = aRaw.agg(sum("a_raw").as("_na"))
    val auths = nodes.join(aRaw, Seq("node"), "left")
      .crossJoin(broadcast(aNorm))
      .select(col("node"),
        (coalesce(col("a_raw"), lit(0.0)) / col("_na")).as("auth"))
      .lineageCut
    val hRaw = byDst
      .join(auths.select(col("node"), col("auth")),
        byDst("dst") === col("node"))
      .groupBy(byDst("src").as("node"))
      .agg(sum("auth").as("h_raw"))
    val hNorm = hRaw.agg(sum("h_raw").as("_nh"))
    val hubs = nodes.join(hRaw, Seq("node"), "left")
      .crossJoin(broadcast(hNorm))
      .select(col("node"),
        (coalesce(col("h_raw"), lit(0.0)) / col("_nh")).as("hub"))
    auths.join(hubs, "node").lineageCut
  }
}
