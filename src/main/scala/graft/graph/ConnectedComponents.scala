package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    labels
  }

  /** Dedup consolidation: (doc_id, group_id, keep) for every doc in
    * the pair graph, keeping the minimum doc id of each group.
    */
  def dupGroups(pairs: DataFrame, iters: Int = 8): DataFrame =
    minLabel(pairs, iters)
      .select(col("id").as("doc_id"), col("label").as("group_id"),
        (col("id") === col("label")).as("keep"))
}
