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

  /** Symmetric distinct-neighbor pairs (u, v), self-loops dropped.
    * The canonical list is cut before the two-direction union:
    * nothing dedupes the doubled subtree, and for the word-graph
    * queries it is the whole tokenize+pair+distinct chain
    * (round-16 optimization — one execution, not two).
    */
  private def sym(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .lineageCut
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

  /** FULL core decomposition (bounded form): every node's core
    * number — the largest k at which it survives peeling — computed
    * PROGRESSIVELY: the k-level starts from the (k−1)-level's
    * survivors (cores are nested) and runs `waves` synchronous peel
    * waves of "keep nodes with ≥ k alive neighbors". Core numbers
    * are capped at `maxK` (the k-tail of a graph card, like g12's
    * degree tail) and each level's peel is bounded at `waves` —
    * BOTH bounds are the DEFINED semantics (the g7/g4 pattern: an
    * unrolled SQL mirror needs static counts); the convergence twin
    * [[decomposeUntilStable]] is spec-checked to agree once bounded
    * peeling has stabilized inside the caps.
    *
    * Scale shape: the symmetric edge set shuffles ONCE; each wave is
    * the same two alive-joins + partial-agg recount as [[survivors]],
    * and each level's survivor set only shrinks, so total work is
    * bounded by maxK × waves × (join over the current survivor
    * subgraph). Alive sets are lineage-cut per level — the plan
    * never nests across levels.
    *
    * @return (node, core) for every node appearing in an edge;
    *   core ∈ [1, maxK]
    */
  def decompose(edges: DataFrame, maxK: Int, waves: Int): DataFrame = {
    require(maxK >= 1, "maxK must be >= 1")
    require(waves >= 1, "at least one wave")
    val spark = edges.sparkSession
    val shufflePartitions =
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Eager lineage cut, not persist: blocks self-release with the
    // RDD (CacheHygieneSpec), and the partitioning survives into the
    // LogicalRDD for every level's alive joins.
    val symE = sym(edges)
      .repartition(shufflePartitions, col("u"))
      .lineageCut
    // Level 1: every node on an edge (degree ≥ 1 by construction).
    var alive = symE.select(col("u").as("node")).distinct().lineageCut
    var out = alive.withColumn("core", lit(1L))
    for (k <- 2 to maxK) {
      // Cut per WAVE, not per level: the plan otherwise nests two
      // joins + an aggregate per wave, and a large caller-supplied
      // `waves` reproduces the deep-plan blowup documented on
      // LabelPropagation (decomposeUntilStable already cuts per wave).
      for (_ <- 1 to waves)
        alive = wave(symE, alive, k).lineageCut
      out = out.union(alive.withColumn("core", lit(k.toLong)))
    }
    out.groupBy("node").agg(max("core").as("core"))
  }

  /** Convergence twin of [[decompose]]: each level peels until a
    * wave removes nothing (one O(1) scalar per wave), and the level
    * loop stops early once a core empties — so the returned core
    * numbers are EXACT (not wave-bounded) up to `maxK`. Throws if a
    * level fails to stabilize within `maxWaves`.
    */
  def decomposeUntilStable(edges: DataFrame, maxK: Int,
      maxWaves: Int = 100): DataFrame = {
    require(maxK >= 1, "maxK must be >= 1")
    val spark = edges.sparkSession
    val shufflePartitions =
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    val symE = sym(edges)
      .repartition(shufflePartitions, col("u"))
      .lineageCut
    var alive = symE.select(col("u").as("node")).distinct().lineageCut
    var out = alive.withColumn("core", lit(1L))
    var n = alive.count()
    var k = 2
    while (k <= maxK && n > 0) {
      var stable = false
      var w = 0
      while (!stable && w < maxWaves) {
        val next = wave(symE, alive, k).lineageCut
        val m = next.count()
        stable = m == n
        alive = next
        n = m
        w += 1
      }
      require(stable, s"core level $k did not stabilize in $maxWaves waves")
      if (n > 0) out = out.union(alive.withColumn("core", lit(k.toLong)))
      k += 1
    }
    out.groupBy("node").agg(max("core").as("core"))
  }
}
