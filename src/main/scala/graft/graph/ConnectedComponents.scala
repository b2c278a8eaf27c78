package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Checkpointing.CutOps

/** Connected components over an undirected pair list by iterative
  * min-label propagation — the dedup-pipeline consolidation step that
  * collapses near-dup PAIRS ((a,b),(b,c)) into GROUPS ({a,b,c}) with
  * one survivor each.
  *
  * Per round every vertex takes the minimum label among itself and
  * its neighbors; after `iters ≥ diameter` rounds each component
  * carries its minimum member id as the group label. Near-dup
  * components are shallow (copies of a common source), so a small
  * fixed round count converges; a fixed count is also what keeps the
  * operator bit-reproducible against an unrolled SQL oracle. For
  * adversarially deep graphs (long chains), switch to the
  * small-star/large-star contraction algorithm — min propagation is
  * O(diameter) rounds, star contraction O(log n).
  *
  * Scale shape (mirrors graft.graph.PageRank): symmetric edges are
  * hash-partitioned by `src` ONCE and persisted; every round's join
  * reuses that partitioning, so only the O(|V|) label table moves.
  * The min-label groupBy is a partial aggregate — per-partition mins
  * combine before the exchange.
  */
object ConnectedComponents {

  /** @param pairs undirected edges as (a, b) — both long ids
    * @return (id, label): every vertex appearing in `pairs`, labeled
    *   with its component's minimum vertex id (given enough rounds)
    */
  def minLabel(pairs: DataFrame, iters: Int): DataFrame = {
    val spark = pairs.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Symmetric edges PLUS a self-loop per vertex: with self-loops,
    // "min over self and neighbors" is ONE join + groupBy per round —
    // the label table is referenced exactly once per round, keeping
    // the unrolled plan linear in `iters`. (The union-with-own-label
    // formulation references labels twice per round: a 2^iters
    // logical-plan blowup, the Spark-side analog of the inlined-CTE
    // explosion the SQL oracle needed MATERIALIZED for.)
    val sym = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    val edges = sym
      .union(sym.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst")))
      .repartition(shufflePartitions, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
    for (_ <- 1 to iters) {
      // Labels flow along edges (self-loops carry each vertex's own
      // label); min is a partial aggregate. The join's streamed side
      // is the persisted edge partitioning; labels (the small side)
      // shuffle to it.
      labels = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
        .groupBy("id")
        .agg(min("label").as("label"))
    }
    // Eager localCheckpoint: materializes the O(|V|) label table ONCE
    // (so every downstream action — and dupGroups' convergence check
    // plus its final output — reads stored blocks instead of re-running
    // `iters` join rounds), truncates the iters-deep lineage, and lets
    // the edge cache be released here instead of leaking into the
    // caller's session (cached blocks otherwise pile up across a
    // many-query verify run and lean on LRU eviction).
    val out = labels.lineageCut
    edges.unpersist()
    out
  }

  /** Dedup consolidation: (doc_id, group_id, keep) for every doc in
    * the pair graph, keeping the minimum doc id of each group.
    *
    * `iters` rounds of min-label propagation converge only when every
    * component's min-eccentricity is ≤ `iters` — true for real LSH
    * dup graphs (star-shaped copies of a common source) but silently
    * wrong for adversarially deep graphs (a chain of hops longer than
    * `iters`). So the result is CHECKED: min-label is at a fixpoint
    * iff both endpoints of every input pair carry the same label (one
    * O(|pairs|) scalar over the already-materialized label table). If
    * any edge still disagrees, fall through to [[starContract]],
    * whose round count is O(log n) regardless of diameter — callers
    * always get fully-consolidated groups.
    */
  def dupGroups(pairs: DataFrame, iters: Int = 8): DataFrame = {
    // The pair list is typically the OUTPUT of an expensive candidate
    // pipeline (LSH bucket join + exact verify); it is read up to
    // three times here (edge build, convergence check, fallback), so
    // cache it for the duration. Everything downstream materializes
    // eagerly (labels via minLabel's checkpoint, star rounds via
    // theirs), so the cache can be dropped before returning — the
    // returned plan reads only checkpointed blocks.
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val labels = minLabel(p, iters)
      val la = labels.select(col("id").as("a"), col("label").as("la"))
      val lb = labels.select(col("id").as("b"), col("label").as("lb"))
      val converged = p.join(la, "a").join(lb, "b")
        .filter(col("la") =!= col("lb"))
        .isEmpty
      val resolved = if (converged) labels else starContract(p)
      resolved
        .select(col("id").as("doc_id"), col("label").as("group_id"),
          (col("id") === col("label")).as("keep"))
    } finally p.unpersist(blocking = false)
  }

  /** Alternating large-star / small-star contraction — the O(log n)
    * connected-components algorithm (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014) for graphs whose
    * DIAMETER is not small: [[minLabel]] needs one round per hop, so
    * a million-link chain (adversarial near-dup transitivity) needs a
    * million rounds; star contraction collapses any component in
    * O(log n) rounds regardless of depth.
    *
    * Per round, large-star points every strictly-larger neighbor of
    * each node at the node's minimum neighborhood member, then
    * small-star re-points each node's smaller neighbors (and the node
    * itself) at their minimum — both pure join + partial-agg steps on
    * the edge list. The loop stops when the edge set reaches a
    * fixpoint (every component a star centered on its minimum),
    * detected by one (count, hash-sum) scalar per round — the same
    * O(1) driver traffic as `PageRank.runUntilConverged`'s residual.
    * Each round's edge set is persisted and the previous unpersisted,
    * so lineage stays one round deep.
    *
    * @param pairs undirected edges as (a, b) — both long ids
    * @return (id, label) — component minimum per vertex, identical to
    *   a converged [[minLabel]] on any graph of real pairs (a vertex
    *   appearing ONLY in self-loops has nothing to consolidate and is
    *   dropped here, where minLabel would emit it self-labeled)
    */
  def starContract(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    // (count, xor-of-hashes): order-insensitive, ANSI-overflow-free
    // (a sum of 64-bit hashes overflows under ANSI arithmetic), and
    // xor-cancellation needs duplicate rows, which distinct() rules
    // out. A collision would only end the loop one round early with
    // probability ~2^-64.
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    // Eager localCheckpoint per round, not persist: one round reads
    // the previous edge set many times (sym, both join sides), so an
    // un-truncated logical plan grows ~8× per round — the checkpoint
    // makes each round's output a LEAF (and materializes its blocks),
    // keeping every plan one round deep.
    var edges = pairs
      .select(col("a").cast("long").as("u"), col("b").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .lineageCut
    var prev = (-1L, 0L)
    var cur = checksum(edges)
    var rounds = 0
    while (cur != prev && rounds < maxRounds) {
      // Large-star: m(u) = min(Γ(u) ∪ {u}); emit (v, m(u)) for every
      // neighbor v > u. Output edges are (node, smaller-target), so
      // they arrive pre-oriented for the small-star step.
      val sym = edges.select("u", "v")
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val mLarge = sym.groupBy("u").agg(min("v").as("_mv"))
        .select(col("u"), least(col("_mv"), col("u")).as("m"))
      val large = sym.filter(col("v") > col("u"))
        .join(mLarge, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // Small-star over the (hi, lo) edges: m(hi) = min of its
      // smaller neighbors; re-point every lo neighbor and hi itself
      // at m. Self-edges (the m member) drop out.
      val mSmall = large.groupBy("u").agg(min("v").as("m"))
      val small = large.join(mSmall, "u")
        .select(col("v").as("n"), col("m"))
        .union(mSmall.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
        .lineageCut
      edges = small
      prev = cur
      cur = checksum(small)
      rounds += 1
    }
    // A partially-contracted edge set would hand back SPLIT labels
    // with no signal — fail loudly instead. The default cap of 50
    // O(log n) rounds covers any graph that fits on hardware (2^50
    // nodes); hitting it means the input, not the cap, is the bug.
    if (cur != prev) throw new IllegalStateException(
      s"starContract: no edge fixpoint after $maxRounds rounds — " +
        "components would be silently split; raise maxRounds")
    // Fixpoint: every edge is (member, componentMin).
    edges.select(col("u").as("id"), col("v").as("label"))
      .union(edges.select(col("v").as("id"), col("v").as("label")))
      .groupBy("id").agg(min("label").as("label"))
  }
}
