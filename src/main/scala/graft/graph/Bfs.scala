package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distance — the graph-DISTANCE primitive that
  * completes the family (PageRank = centrality, connected components
  * = grouping, triangles = clustering): dist(u) = fewest hops from
  * any seed node, computed to a bounded number of hops.
  *
  * Scale shape (the PageRank skeleton): edges are hash-partitioned by
  * `src` ONCE and persisted — the 100 TB side never re-shuffles; each
  * round joins only the current FRONTIER (nodes first reached in the
  * previous round — the small side) against them, and the min-dist
  * consolidation is a partial aggregate on the node key. Rounds are
  * bounded by `maxHops`, fixed for oracle parity (the caller supplies
  * the diameter bound; open-ended termination would follow the d9
  * convergence-check pattern: one O(1) scalar per round asking "did
  * the frontier empty?").
  */
object Bfs {

  /** @param edges directed (src, dst); deduplicated internally
    * @param seeds (node) — the source set (dist 0)
    * @param maxHops rounds to expand; nodes further than this are
    *   absent from the result
    * @return (node, dist) for every node within `maxHops` of a seed
    */
  def hopDistance(edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select("src", "dst").distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
    for (h <- 1 to maxHops) {
      // Frontier = nodes whose min dist is exactly h-1 (first reached
      // last round): re-expanding older nodes would only regenerate
      // distances the min already beat.
      val frontier = dist.filter(col("dist") === (h - 1))
      val reached = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"), lit(h.toLong).as("dist"))
      dist = dist.union(reached)
        .groupBy("node").agg(min("dist").as("dist"))
    }
    dist
  }
}
