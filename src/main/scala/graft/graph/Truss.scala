package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Checkpointing.CutOps

/** k-truss decomposition over the undirected view of an edge list —
  * the EDGE-centric density primitive completing k-core's node
  * peeling: the k-truss keeps only edges supported by at least k−2
  * triangles WITHIN the surviving subgraph, peeled synchronously
  * until stable. Trusses are strictly nested inside cores and are
  * the standard community-core / spam-ring detector at one notch
  * finer granularity than k-core (an edge between two high-degree
  * nodes with no shared neighborhood — a pure bridge — dies in the
  * 3-truss no matter how high its endpoints' cores are).
  *
  * Two forms, the g7 house pattern: [[survivors]] runs a FIXED
  * number of synchronous peel waves (the oracle-checkable form —
  * waves are idempotent at the fixpoint, so an unrolled SQL mirror
  * with enough rounds states the same result), [[untilStable]] peels
  * until a wave removes no edge (O(1) count per wave) and throws
  * rather than returning an unconverged truss.
  *
  * Scale shape: each wave re-derives the symmetric adjacency of the
  * SURVIVING edge set and counts each edge's common neighbors with
  * two co-partitioned equi-joins + one partial agg (the
  * triangle-wedge shape); per-wave lineage cuts keep the plan linear
  * in waves. Unlike k-core the edge table itself shrinks
  * monotonically, so later waves get cheaper.
  */
object Truss {

  /** Canonical undirected loop-free edges (a < b). */
  private def und(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /** One synchronous wave: per-edge support within `t`, keep
    * support ≥ k−2. Edges with NO common neighbor vanish from the
    * inner wedge join — i.e. support 0 — and drop for any k ≥ 3.
    */
  private def wave(t: DataFrame, k: Int): DataFrame = {
    val s = t.select(col("a").as("u"), col("b").as("v"))
      .union(t.select(col("b").as("u"), col("a").as("v")))
    t.join(s.select(col("u").as("a"), col("v").as("c")), "a")
      .join(s.select(col("u").as("b"), col("v").as("c")), Seq("b", "c"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= k - 2)
  }

  /** `waves` synchronous peel waves, then the surviving edges with
    * their support within the survivor set.
    *
    * @return (a, b, support) for edges alive after `waves` waves
    */
  /** `waves` bounded synchronous peel waves at level `k` — the ONE
    * copy of the bounded loop all public forms share.
    */
  private def peelBounded(t0: DataFrame, k: Int, waves: Int): DataFrame = {
    var t = t0
    for (_ <- 1 to waves)
      t = wave(t, k).select("a", "b").lineageCut
    t
  }

  /** Peel at level `k` until a wave removes no edge (one O(1) count
    * per wave); returns the survivors with their count, throws past
    * `maxWaves` — the ONE copy of the convergence loop.
    */
  private def peelUntilStable(t0: DataFrame, n0: Long, k: Int,
      maxWaves: Int, label: String): (DataFrame, Long) = {
    var t = t0
    var n = n0
    var stable = false
    var w = 0
    while (!stable && w < maxWaves) {
      val next = wave(t, k).select("a", "b").lineageCut
      val m = next.count()
      stable = m == n
      t = next
      n = m
      w += 1
    }
    require(stable, s"$label did not stabilize in $maxWaves waves")
    (t, n)
  }

  def survivors(edges: DataFrame, k: Int, waves: Int): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3")
    require(waves >= 1, "at least one wave")
    val t = peelBounded(und(edges).lineageCut, k, waves)
    // Final support within the stable survivor set.
    wave(t, k).select(col("a"), col("b"), col("support"))
  }

  /** Convergence twin: peel until a wave removes no edge; throws
    * rather than returning an unconverged truss.
    */
  def untilStable(edges: DataFrame, k: Int, maxWaves: Int = 100)
      : DataFrame = {
    require(k >= 3, "k-truss needs k >= 3")
    val t0 = und(edges).lineageCut
    val (t, _) = peelUntilStable(t0, t0.count(), k, maxWaves, "k-truss")
    wave(t, k).select(col("a"), col("b"), col("support"))
  }

  /** FULL truss decomposition — per-edge MAX k such that the edge
    * survives the k-truss (the edge-centric twin of
    * [[KCore.decompose]], same progressive contract): trusses are
    * nested, so level k peels the (k−1)-level's survivors with
    * `waves` synchronous waves; truss numbers are capped at `maxK`
    * and each level's peel is wave-bounded — both bounds are the
    * DEFINED semantics (the unrolled SQL mirror needs static
    * counts); [[decomposeUntilStable]] is the exact convergence
    * twin. Every edge is in the 2-truss by definition.
    *
    * Scale shape: each wave is the triangle-wedge shape over the
    * CURRENT survivor set (two co-partitioned equi-joins + one
    * partial agg), the survivor set shrinks monotonically across
    * waves AND levels, and per-wave lineage cuts keep the plan
    * linear — never nested across levels.
    *
    * @return (a, b, truss) for every undirected edge; truss ∈ [2, maxK]
    */
  def decompose(edges: DataFrame, maxK: Int, waves: Int): DataFrame = {
    require(maxK >= 2, "maxK must be >= 2")
    require(waves >= 1, "at least one wave")
    var t = und(edges).lineageCut
    var out = t.withColumn("truss", lit(2L))
    var k = 3
    var empty = false
    while (k <= maxK && !empty) {
      t = peelBounded(t, k, waves)
      // Survivors only shrink: once a level empties, every later
      // level is empty too — skip its dead checkpoint waves
      // (result-identical; wave(empty, k) = empty).
      empty = t.isEmpty
      if (!empty) out = out.union(t.withColumn("truss", lit(k.toLong)))
      k += 1
    }
    out.groupBy("a", "b").agg(max("truss").as("truss"))
  }

  /** Convergence twin of [[decompose]]: each level peels until a
    * wave removes nothing, the level loop stops once a truss
    * empties — truss numbers EXACT up to `maxK`.
    */
  def decomposeUntilStable(edges: DataFrame, maxK: Int,
      maxWaves: Int = 100): DataFrame = {
    require(maxK >= 2, "maxK must be >= 2")
    var t = und(edges).lineageCut
    var out = t.withColumn("truss", lit(2L))
    var n = t.count()
    var k = 3
    while (k <= maxK && n > 0) {
      val (t2, n2) = peelUntilStable(t, n, k, maxWaves, s"truss level $k")
      t = t2
      n = n2
      if (n > 0) out = out.union(t.withColumn("truss", lit(k.toLong)))
      k += 1
    }
    out.groupBy("a", "b").agg(max("truss").as("truss"))
  }
}
