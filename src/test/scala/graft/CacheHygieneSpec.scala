package graft

import org.apache.spark.sql.DataFrame

import graft.graph._

/** Pins release-on-return cache hygiene for EVERY graph operator
  * that persists internally: in a long-lived session (Verify/Bench
  * evaluate hundreds of queries in one JVM) an operator that returns
  * with blocks still registered in the cache manager leaks one cached
  * table per evaluation. The round-10 audit found two such leaks
  * (Walks.run's adjacency, GraphStats.modularity's undirected edge
  * set); this suite catches the whole class, not just those two —
  * any future iterative operator that persists a loop cache and
  * forgets the Sssp.run release-on-return step fails here by name.
  *
  * Protocol per operator: clear the cache manager, build, FORCE
  * evaluation (count — hygiene must hold after the caller actually
  * ran the plan, not just constructed it), then assert the cache
  * manager is empty again. localCheckpoint blocks are NOT cache
  * entries (they live in the block manager and self-release with
  * their RDD), so lineage-cut results pass; only forgotten
  * persist() calls fail.
  */
class CacheHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def cacheEmpty: Boolean = spark.sharedState.cacheManager.isEmpty

  /** Two small graphs: a directed one with cycles + a dangling node,
    * and a weighted variant. Enough structure that every operator
    * does real work (multiple rounds, non-trivial frontiers).
    */
  private lazy val edges: DataFrame = Seq(
    ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
    ("e", "c"), ("b", "d"), ("a", "e"), ("e", "a"), ("f", "a")
  ).toDF("src", "dst")

  private lazy val wedges: DataFrame = edges
    .withColumn("cost", org.apache.spark.sql.functions.lit(2L))

  private lazy val seeds: DataFrame = Seq("a", "f").toDF("node")

  private def checkReleased(name: String)(build: => DataFrame): Unit =
    test(s"$name releases every internal cache on return") {
      spark.sharedState.cacheManager.clearCache()
      val out = build
      assert(out.count() >= 0)
      assert(cacheEmpty, s"$name left cached entries behind")
    }

  checkReleased("PageRank.run")(PageRank.run(edges, iterations = 4))
  checkReleased("PageRank.run(redistributeDangling)")(
    PageRank.run(edges, iterations = 4, redistributeDangling = true))
  checkReleased("PageRank.runWeighted")(
    PageRank.runWeighted(wedges.withColumnRenamed("cost", "weight"),
      iterations = 4))
  checkReleased("PageRank.runPersonalized")(
    PageRank.runPersonalized(edges, seeds, iterations = 4))
  checkReleased("Bfs.hopDistance")(Bfs.hopDistance(edges, seeds, maxHops = 4))
  checkReleased("Bfs.hopDistanceUntilDone")(
    Bfs.hopDistanceUntilDone(edges, seeds)._1)
  checkReleased("Sssp.run")(Sssp.run(wedges, seeds, rounds = 4))
  checkReleased("Sssp.runUntilStable")(Sssp.runUntilStable(wedges, seeds)._1)
  checkReleased("Walks.run")(Walks.run(edges, seeds, steps = 4))
  checkReleased("Walks.skipGramPairs")(
    Walks.skipGramPairs(Walks.run(edges, seeds, steps = 4), window = 2))
  checkReleased("GraphStats.assortativity")(GraphStats.assortativity(edges))
  checkReleased("GraphStats.reciprocity")(GraphStats.reciprocity(edges))
  checkReleased("GraphStats.modularity")(
    GraphStats.modularity(edges,
      LabelPropagation.communities(edges, iters = 3)))
  checkReleased("KCore.survivors")(KCore.survivors(edges, k = 2, waves = 4))
  checkReleased("KCore.untilStable")(KCore.untilStable(edges, k = 2))
  checkReleased("Truss.survivors")(Truss.survivors(edges, k = 3, waves = 4))
  checkReleased("Truss.untilStable")(Truss.untilStable(edges, k = 3))
  checkReleased("Scc.run")(Scc.run(edges))
  checkReleased("LabelPropagation.communities")(
    LabelPropagation.communities(edges, iters = 3))
  checkReleased("Hits.run")(Hits.run(edges, iterations = 4))
  checkReleased("Harmonic.fromLandmarks")(
    Harmonic.fromLandmarks(edges, seeds, maxHops = 4))
  checkReleased("Triangles.globalCount")(Triangles.globalCount(edges))
  checkReleased("Triangles.clusteringCoefficients")(
    Triangles.clusteringCoefficients(edges))
  checkReleased("Neighborhood.kmvBalls")(
    Neighborhood.kmvBalls(edges, hops = 3, k = 8))
  checkReleased("ConnectedComponents.minLabel")(
    ConnectedComponents.minLabel(
      edges.select($"src".as("a"), $"dst".as("b")), iters = 4))
  checkReleased("ConnectedComponents.dupGroups")(
    ConnectedComponents.dupGroups(
      edges.select($"src".as("a"), $"dst".as("b"))))
  // starContract contracts LONG vertex ids (its contract) — hash the
  // names to longs like the dedup callers do.
  checkReleased("ConnectedComponents.starContract")(
    ConnectedComponents.starContract(
      edges.select(
        org.apache.spark.sql.functions.xxhash64($"src").as("a"),
        org.apache.spark.sql.functions.xxhash64($"dst").as("b"))))
  // tol 1e-3 / cut-every-5: at 0.85^k contraction the loop runs ~40
  // rounds; an uncut 40-round logical plan overflows the stack when
  // Spark renders it for the SQL-execution event, so the open-ended
  // loop needs the checkpoint cadence its Scaladoc prescribes.
  checkReleased("PageRank.runUntilConverged")(
    PageRank.runUntilConverged(edges, tol = 1e-3, checkpointEvery = 5)._1)
  checkReleased("LabelPropagation.communitiesUntilStable")(
    LabelPropagation.communitiesUntilStable(edges)._1)
}
