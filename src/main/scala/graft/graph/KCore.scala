package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Checkpointing.CutOps

/** k-core decomposition over the undirected view of an edge list —
  * the dense-subgraph primitive completing the graph family's
  * structure axis (triangles = local density, clustering coeff =
  * normalized, k-core = global peeling): the k-core is what remains
  * after repeatedly deleting nodes with fewer than k surviving
  * neighbors. Spam rings and boilerplate template clusters sit in
  * high cores; tendrils and one-off pages peel away.
  *
  * Two forms, the g4/g3 house pattern:
  *   - [[survivors]] — a FIXED number of synchronous peeling waves
  *     (the oracle-checkable form: an unrolled SQL mirror needs a
  *     static wave count);
  *   - [[untilStable]] — the convergence twin, peeling until no node
  *     is removed (spec-checked to agree with [[survivors]] once the
  *     bounded form has converged).
  *
  * Scale shape: the symmetric neighbor list is hash-partitioned by
  * `u` ONCE and persisted; each wave joins it with the O(|V|) alive
  * list on both endpoints and re-counts degrees with a partial
  * aggregate — the 100 TB edge set never re-shuffles.
  */
object KCore {

  /** Symmetric distinct-neighbor pairs (u, v), self-loops dropped. */
  private def sym(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
  }

  private def wave(symE: DataFrame, alive: DataFrame, k: Int): DataFrame =
    symE
      .join(alive.withColumnRenamed("node", "u"), "u")
      .join(alive.withColumnRenamed("node", "v"), "v")
      .groupBy("u").agg(count(lit(1)).as("d"))
      .filter(col("d") >= k)
      .select(col("u").as("node"))

  /** `waves` synchronous peeling waves, then the surviving nodes with
    * their degree WITHIN the survivor set.
    *
    * @return (node, core_degree) for nodes alive after `waves` waves
    */
  def survivors(edges: DataFrame, k: Int, waves: Int): DataFrame = {
    require(waves >= 1, "at least one wave")
    val spark = edges.sparkSession
    val shufflePartitions =
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    val symE = sym(edges)
      .repartition(shufflePartitions, col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var alive = symE.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("u").as("node"))
      for (_ <- 2 to waves)
        alive = wave(symE, alive, k)
      val out = symE
        .join(alive.withColumnRenamed("node", "u"), "u")
        .join(alive.withColumnRenamed("node", "v"), "v")
        .groupBy("u").agg(count(lit(1)).as("core_degree"))
        .select(col("u").as("node"), col("core_degree"))
        .lineageCut
      out
    } finally symE.unpersist(blocking = false)
  }

  /** Convergence twin: peel until a wave removes nothing (checked on
    * an O(1) count per wave); throws rather than returning an
    * unconverged core.
    */
  def untilStable(edges: DataFrame, k: Int, maxWaves: Int = 100)
      : DataFrame = {
    val spark = edges.sparkSession
    val shufflePartitions =
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    val symE = sym(edges)
      .repartition(shufflePartitions, col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var alive = symE.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("u").as("node"))
        .lineageCut
      var n = alive.count()
      var stable = false
      var w = 1
      while (!stable && w < maxWaves) {
        val next = wave(symE, alive, k).lineageCut
        val m = next.count()
        stable = m == n
        alive = next
        n = m
        w += 1
      }
      require(stable, s"k-core did not stabilize in $maxWaves waves")
      symE
        .join(alive.withColumnRenamed("node", "u"), "u")
        .join(alive.withColumnRenamed("node", "v"), "v")
        .groupBy("u").agg(count(lit(1)).as("core_degree"))
        .select(col("u").as("node"), col("core_degree"))
        .lineageCut
    } finally symE.unpersist(blocking = false)
  }
}
