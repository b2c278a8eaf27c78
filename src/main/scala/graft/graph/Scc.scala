package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Checkpointing.CutOps

/** STRONGLY connected components over a directed edge list — the
  * directed twin of [[ConnectedComponents]] (which answers "touching
  * at all"; this answers "mutually reachable": link farms, citation
  * rings, redirect cycles in a crawl graph).
  *
  * Algorithm: iterative forward/backward min-reach peeling, the
  * distributed FW-BW/coloring family (Orzan's coloring; Slota et
  * al.'s Multistep). Each outer round, on the remaining subgraph:
  *
  *   1. TRIM: a node appearing only as src (no in-edges) or only as
  *      dst (no out-edges) lies on no cycle — finalize it as a
  *      singleton SCC. This peels the tendril mass (most of a real
  *      crawl graph) without any propagation.
  *   2. F(u) = min id in u's FORWARD closure (incl. u), B(u) = the
  *      same over the REVERSED edges — two min-label fixpoints, each
  *      a convergence-checked propagation loop.
  *   3. F(u) = B(u) = m means m is reachable from u AND reaches u,
  *      so u ∈ SCC(m); conversely every member of SCC(m) shares
  *      F = B = m when m is the minimum over the SCC's reach — so
  *      {u : F(u) = B(u)} finalizes EXACTLY its members' SCCs, with
  *      the shared min as the component label.
  *   4. Remove finalized nodes. No remaining cycle can route through
  *      a finalized node (a cycle through SCC(m) would have merged
  *      into it), so removal is exact, and nodes isolated by the
  *      removal finalize as singletons.
  *
  * Every round finalizes at least SCC(min remaining id) (its F and B
  * are both itself), so rounds are bounded by the SCC "level" depth,
  * not by node count; the trim step collapses tendril chains.
  *
  * Scale shape: mirrors PageRank/ConnectedComponents — each round's
  * edge set is hash-partitioned and persisted; propagation moves
  * only the O(|V|) label table per hop with partial-aggregated mins;
  * finalized labels are checkpointed id lists. Node ids may be any
  * orderable type (string words here; `min` matches SQL `min`).
  */
object Scc {

  /** Min id over the closure along `edges` (src → reaches dst),
    * computed as a convergence-CHECKED min-label fixpoint: chunks of
    * `chunk` propagation hops, then one edge-consistency scan (at a
    * fixpoint no edge has label(src) > label(dst)); throws rather
    * than returning an unconverged closure.
    *
    * @return (id, m) for every node appearing in `edges`
    */
  private def minReach(edges: DataFrame, chunk: Int = 8,
      maxChunks: Int = 16): DataFrame = {
    val spark = edges.sparkSession
    val shufflePartitions =
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    // self-loops make "min over self and successors" one join per hop
    // (the ConnectedComponents idiom — the label table is referenced
    // once per round, keeping the plan linear in hop count)
    val withSelf = edges
      .union(edges.select(col("src")).union(edges.select(col("dst")))
        .distinct().select(col("src"), col("src").as("dst")))
      .repartition(shufflePartitions, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = withSelf.select(col("src").as("id")).distinct()
        .withColumn("m", col("id"))
      var converged = false
      var rounds = 0
      while (!converged && rounds < maxChunks) {
        for (_ <- 1 to chunk) {
          labels = withSelf.join(labels, withSelf("dst") === labels("id"))
            .select(withSelf("src").as("id"), col("m"))
            .groupBy("id")
            .agg(min("m").as("m"))
        }
        labels = labels.lineageCut
        val la = labels.select(col("id").as("src"), col("m").as("ms"))
        val lb = labels.select(col("id").as("dst"), col("m").as("md"))
        converged = edges.join(la, "src").join(lb, "dst")
          .filter(col("ms") > col("md"))
          .isEmpty
        rounds += 1
      }
      require(converged,
        s"min-reach did not converge in ${chunk * maxChunks} hops")
      labels
    } finally withSelf.unpersist(blocking = false)
  }

  /** @param edges0 directed edges (src, dst), any orderable id type
    * @return (node, scc): every node appearing in `edges0`, labeled
    *   with its strongly connected component's minimum member id
    */
  def run(edges0: DataFrame, maxRounds: Int = 40): DataFrame = {
    var remaining = edges0
      .select(col("src"), col("dst")).distinct()
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // finalized pieces accumulate as already-checkpointed frames and
    // union ONCE at return — re-checkpointing a growing union every
    // round would re-materialize all prior rounds' output each time
    val pieces = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // nodes whose only edges were self-loops still need a result row
    pieces += edges0
      .select(col("src"), col("dst")).distinct()
      .filter(col("src") === col("dst"))
      .select(col("src").as("node"), col("src").as("scc"))
      .join(remaining.select(col("src").as("node"))
          .union(remaining.select(col("dst").as("node"))).distinct(),
        Seq("node"), "left_anti")
      .lineageCut
    var round = 0
    var empty = remaining.isEmpty
    while (!empty && round < maxRounds) {
      val srcs = remaining.select(col("src").as("node")).distinct()
      val dsts = remaining.select(col("dst").as("node")).distinct()
      val nodes = srcs.union(dsts).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      // 1. trim: only-src (no in-edges) / only-dst (no out-edges)
      //    nodes lie on no cycle — singleton SCCs
      val trimmed = srcs.except(dsts).union(dsts.except(srcs))
        .select(col("node"), col("node").as("scc"))
      // 2-3. F/B fixpoints on the remaining graph; F = B finalizes
      val f = minReach(remaining)
      val b = minReach(remaining
        .select(col("dst").as("src"), col("src").as("dst")))
        .withColumnRenamed("m", "mb")
      val matched = f.join(b, "id")
        .filter(col("m") === col("mb"))
        .select(col("id").as("node"), col("m").as("scc"))
      val done = trimmed.union(matched)
        .groupBy("node").agg(min("scc").as("scc"))
        .lineageCut
      pieces += done
      // 4. drop every edge touching a finalized node; nodes isolated
      //    by the removal finalize as singletons
      val doneIds = done.select("node")
      val nextRemaining = remaining
        .join(doneIds.withColumnRenamed("node", "src"),
          Seq("src"), "left_anti")
        .join(doneIds.withColumnRenamed("node", "dst"),
          Seq("dst"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val survivors = nextRemaining.select(col("src").as("node"))
        .union(nextRemaining.select(col("dst").as("node"))).distinct()
      pieces += nodes
        .join(done.select("node"), Seq("node"), "left_anti")
        .join(survivors, Seq("node"), "left_anti")
        .select(col("node"), col("node").as("scc"))
        .lineageCut
      empty = nextRemaining.isEmpty
      remaining.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
      remaining = nextRemaining
      round += 1
    }
    require(empty, s"SCC peeling did not converge in $maxRounds rounds")
    remaining.unpersist(blocking = false)
    pieces.reduce(_ unionByName _)
  }
}
