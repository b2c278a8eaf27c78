package graft

import graft.graph.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains and isolated pairs collapse to min-id groups") {
    // chain 1-2-3-4, pair 10-11, triangle-ish 20-21, 21-22, 20-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val got = ConnectedComponents.dupGroups(pairs, iters = 4)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false),
      (20L, 20L, true), (21L, 20L, false), (22L, 20L, false)))
  }

  test("randomized: agrees with union-find on arbitrary pair graphs") {
    val rnd = new scala.util.Random(7L)
    for (round <- 1 to 5) {
      val n = 6 + rnd.nextInt(20)
      val pairs = (1 to n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      if (pairs.nonEmpty) {
        // Union-find ground truth.
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
        val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        val want = verts.groupBy(find).flatMap { case (_, vs) =>
          val m = vs.min; vs.map(_ -> m)
        }.toMap

        // iters = the exact propagation depth: the deepest BFS level
        // from any component's min vertex (min-label needs that many
        // rounds to reach the farthest member, and no more).
        val adj = (pairs ++ pairs.map(_.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val depth = want.groupBy(_._2).keys.map { root =>
          var frontier = Set(root); var seen = Set(root); var d = 0
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(adj.getOrElse(_, Nil)) -- seen
            seen ++= frontier; if (frontier.nonEmpty) d += 1
          }
          d
        }.max
        val got = ConnectedComponents
          .minLabel(pairs.toDF("a", "b"), iters = math.max(depth, 1))
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"round $round: n=$n pairs=${pairs.size}")
      }
    }
  }

  test("propagation reaches the far end of a path within diameter rounds") {
    // path 5-6-7-8-9: min label 5 must reach 9 (diameter 4).
    val pairs = Seq((8L, 9L), (6L, 7L), (5L, 6L), (7L, 8L)).toDF("a", "b")
    val labels = ConnectedComponents.minLabel(pairs, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L, 9L -> 5L))
  }

  test("dupGroups auto-falls-through to star contraction on deep chains") {
    // 40-hop chain: diameter 39 >> the default 8 min-label rounds, so
    // the d9 entry point's convergence check (any pair with
    // disagreeing endpoint labels?) must detect the miss and reroute
    // through starContract — callers always get fully-consolidated
    // groups, never silently split ones.
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.dupGroups(chain) // default iters = 8
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == (0L to 39L).map(i => (i, 0L, i == 0L)).toSet)
    // And the check must NOT reroute a shallow graph: a star (the
    // real LSH dup-group shape) converges in one round and takes the
    // fixed-round path unchanged.
    val star = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    val gotStar = ConnectedComponents.dupGroups(star, iters = 2)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(gotStar == (0L to 5L).map(i => (i, 0L, i == 0L)).toSet)
  }

  test("star contraction equals converged min-label on random graphs") {
    val rnd = new scala.util.Random(11L)
    for (round <- 1 to 4) {
      val edges = (1 to 30 + rnd.nextInt(40))
        .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(p => p._1 != p._2)
      val df = edges.toDF("a", "b")
      // 30 rounds >> the diameter of a 60-node random graph.
      val want = ConnectedComponents.minLabel(df, iters = 30)
        .as[(Long, Long)].collect().toMap
      val got = ConnectedComponents.starContract(df)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"round $round")
    }
  }

  test("star contraction fails loudly when maxRounds cuts convergence") {
    // A 64-node chain cannot reach the fixpoint in 1 round; returning
    // the partially-contracted edges would hand back split labels.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.starContract(chain, maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("no edge fixpoint"))
  }

  test("star contraction collapses a 200-node chain in O(log n) rounds") {
    // min-label would need 199 rounds for this diameter; the
    // maxRounds cap pins the logarithmic convergence claim.
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = ConnectedComponents.starContract(chain, maxRounds = 15)
      .as[(Long, Long)].collect()
    assert(labels.length == 200)
    assert(labels.forall(_._2 == 0L))
  }
}
