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

  test("propagation reaches the far end of a path within diameter rounds") {
    // path 5-6-7-8-9: min label 5 must reach 9 (diameter 4).
    val pairs = Seq((8L, 9L), (6L, 7L), (5L, 6L), (7L, 8L)).toDF("a", "b")
    val labels = ConnectedComponents.minLabel(pairs, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L, 9L -> 5L))
  }
}
