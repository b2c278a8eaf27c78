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
  checkReleased("Louvain.communities")(
    Louvain.communities(edges, levels = 2, moveRounds = 2))
  checkReleased("Betweenness.landmarkStress")(
    Betweenness.landmarkStress(edges, seeds, maxHops = 3))

  // ---- Pipeline operators that persist internally (the round-11
  // verdict's remaining hygiene gap). Two classes:
  //   - EAGER operators (walks that lineage-cut per round, trainers
  //     that collect) release in `finally` — same protocol as the
  //     graph layer.
  //   - LAZY-RETURN pair operators (Dedup, embedNearDupPairs)
  //     deliberately leave their signature tables cached — the
  //     returned plan reads them twice and Bench's steady-state
  //     reuse claim depends on the blocks surviving the call; the
  //     DOCUMENTED contract is caller-releases (Verify clears per
  //     query). The pin here: clearCache fully reclaims them (no
  //     entry survives the documented release path).

  private lazy val emb: DataFrame = {
    val rows = (0 until 24).map { i =>
      val e = Array.tabulate(8)(d =>
        (math.sin(i * 2.7 + d) + (if (d == i % 2) 2.0 else 0.0)).toFloat)
      (i.toLong, e, (i % 2).toLong)
    }
    rows.toDF("vec_id", "embedding", "label")
  }
  private lazy val knnEdges: DataFrame =
    graft.operators.Similarity.knnGraph(emb, "label", k = 4)
      .select($"vec_id", $"nbr_id")
  private lazy val queries: DataFrame = emb.filter($"vec_id" < 3)
  private lazy val entries: DataFrame =
    emb.filter($"vec_id" === 4).select($"vec_id".as("cand_id"))
  private lazy val docs: DataFrame = Seq(
    (1L, "the cat sat on the mat and the dog sat too"),
    (2L, "the cat sat on the mat and the dog sat too"),
    (3L, "a completely different document about spark plans"),
    (4L, "the quick brown fox jumps over the lazy dog again"),
    (5L, "a completely different document about spark plans today")
  ).toDF("doc_id", "text")

  import graft.operators.{Dedup, KMeans, Similarity}

  checkReleased("Similarity.graphBeamSearch")(
    Similarity.graphBeamSearch(emb, queries, knnEdges, entries,
      beamWidth = 4, rounds = 2))
  checkReleased("Similarity.graphBeamSearchUntilStable")(
    Similarity.graphBeamSearchUntilStable(emb, queries, knnEdges,
      entries, beamWidth = 4))
  checkReleased("Similarity.graphBeamSearchFiltered")(
    Similarity.graphBeamSearchFiltered(emb, queries, knnEdges,
      entries, beamWidth = 4, rounds = 2,
      candidatePred = $"vec_id" % 2 === 0))
  checkReleased("Similarity.hierarchicalBeamSearch")(
    Similarity.hierarchicalBeamSearch(emb, queries,
      Similarity.hierarchicalNavGraph(emb, "label", maxLevel = 2,
        k0 = 4, kUpper = 2),
      entries, maxLevel = 2, upperWidth = 2, upperRounds = 1,
      beamWidth = 4, rounds = 1))
  private lazy val embD: DataFrame = emb.select($"vec_id",
    org.apache.spark.sql.functions.expr(
      "transform(embedding, v -> cast(v as double))").as("embedding"))
  checkReleased("KMeans.train")(KMeans.train(embD, k = 2, iters = 3))
  checkReleased("KMeans.trainUntilConverged")(
    KMeans.trainUntilConverged(embD, k = 2, tol = 1e-3, maxIters = 8))
  checkReleased("KMeans.seedsPlusPlus")(KMeans.seedsPlusPlus(embD, 3))

  test("BpeTrain.learnMerges releases every internal cache on return") {
    spark.sharedState.cacheManager.clearCache()
    val vocab = Seq(("lower", 5L), ("lowest", 3L), ("newer", 4L))
      .toDF("tok", "n")
    assert(graft.operators.BpeTrain.learnMerges(vocab, rounds = 3)
      .nonEmpty)
    assert(cacheEmpty, "BpeTrain left cached entries behind")
  }

  private def checkCallerReleased(name: String)(build: => DataFrame)
      : Unit =
    test(s"$name: caller-releases contract — clearCache reclaims all") {
      spark.sharedState.cacheManager.clearCache()
      val out = build
      assert(out.count() >= 0)
      spark.catalog.clearCache()
      assert(cacheEmpty, s"$name cache survived clearCache")
    }

  checkCallerReleased("Dedup.ngramJaccardPairs")(
    Dedup.ngramJaccardPairs(docs, minJaccard = 0.8))
  checkCallerReleased("Dedup.containmentPairs")(
    Dedup.containmentPairs(docs, minContainment = 0.8))
  checkCallerReleased("Dedup.minhashLshPairs")(
    Dedup.minhashLshPairs(docs, minJaccard = 0.8))
  checkCallerReleased("Dedup.minhashLshAgainst")(
    Dedup.minhashLshAgainst(docs.filter($"doc_id" > 3), docs,
      minJaccard = 0.8))
  checkCallerReleased("Dedup.simhashPairs")(
    Dedup.simhashPairs(docs, maxHamming = 3))
  checkCallerReleased("Dedup.winnowFingerprintTable")(
    Dedup.winnowFingerprintTable(docs))
  checkCallerReleased("Dedup.winnowingAgainst")(
    Dedup.winnowingAgainst(docs.filter($"doc_id" > 3), docs,
      minJaccard = 0.8))

  test("UnigramLm.train releases every internal cache on return") {
    spark.sharedState.cacheManager.clearCache()
    val words = Seq(("abab", 5L), ("ab", 3L)).toDF("w", "n")
    assert(graft.operators.UnigramLm.train(words).count() >= 0)
    assert(cacheEmpty, "UnigramLm left cached entries behind")
  }
  checkCallerReleased("Similarity.embedNearDupPairs")(
    Similarity.embedNearDupPairs(embD
      .join(emb.select($"vec_id", $"label"), "vec_id"), minCos = 0.9))

  test("NavIndexPipeline build/delete release every internal cache") {
    spark.sharedState.cacheManager.clearCache()
    val idx = java.nio.file.Files.createTempDirectory("graft_navhyg")
      .toFile.getAbsolutePath
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 120)
    graft.sources.NavIndexPipeline.build(spark, emb, idx,
      maxDegree = 4, maxCandidates = 8, perCell = 30, iters = 2)
    assert(cacheEmpty, "NavIndexPipeline.build left cached entries behind")
    graft.sources.NavIndexPipeline.delete(spark, idx,
      emb.select($"vec_id").filter($"vec_id" < 10))
    assert(cacheEmpty, "NavIndexPipeline.delete left cached entries behind")
  }

  /** The grep-driven roster (round-11 verdict item): every file in
    * src/main with a `.persist(` site must be enumerated here, so a
    * NEW persist cannot dodge hygiene coverage — adding one forces
    * the author to extend this spec (either protocol) or justify the
    * site on the roster.
    */
  test("every .persist( site in src/main is on this spec's roster") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val walk = java.nio.file.Files.walk(root)
    val persisting =
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .filter(p => new String(java.nio.file.Files.readAllBytes(p))
          .contains(".persist("))
        .map(_.getFileName.toString).toSet
      finally walk.close() // Files.walk holds directory handles
    val roster = Set(
      // release-on-return, pinned by checkReleased above
      "KCore.scala", "Neighborhood.scala", "Scc.scala", "Hits.scala",
      "PageRank.scala", "ConnectedComponents.scala", "Sssp.scala",
      "Bfs.scala", "Harmonic.scala", "Walks.scala", "KMeans.scala",
      "BpeTrain.scala", "Similarity.scala", "Betweenness.scala",
      "UnigramLm.scala", "NavIndexPipeline.scala",
      // documented caller-releases, pinned by checkCallerReleased
      "Dedup.scala",
      // query-local persist under Verify's per-query clearCache
      // (d30's thrice-read BPE encoding)
      "PipelineQueries.scala")
    assert(persisting.subsetOf(roster),
      s"uncovered persist sites: ${(persisting -- roster).mkString(", ")}")
  }
}
