package graft

import graft.sources.Bucketed

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables sort-merge join with no exchange") {
    // Fresh location per run: the in-memory catalog forgets tables
    // between JVMs but their files persist, and CREATE refuses an
    // existing managed-table location.
    val wh = java.nio.file.Files.createTempDirectory("graft_bt_wh")
    spark.sql("DROP DATABASE IF EXISTS graft_bt CASCADE")
    spark.sql(s"CREATE DATABASE graft_bt LOCATION '$wh'")
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "a")
    val dims = (1 to 1000).map(i => (i.toLong % 50, i * 2.0)).toDF("k", "b")
    Bucketed.writeBucketed(facts, "graft_bt.f", "k", 8)
    Bucketed.writeBucketed(dims, "graft_bt.d", "k", 8)

    // MERGE hint keeps the small tables off the broadcast path so the
    // plan shows what bucketing buys a fact-fact join.
    val joined = spark.table("graft_bt.f").hint("merge")
      .join(spark.table("graft_bt.d"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == facts.join(dims, "k").count())
  }
}
