package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import graft.graph.LinkGraph
object ProbePR {
  def run2(edges: DataFrame, iterations: Int, damping: Double, ckptEvery: Int): DataFrame = {
    val e = edges.select("src", "dst").distinct()
    val outDeg = e.groupBy("src").agg(count("*").as("outdeg"))
    val linked = e.join(outDeg, "src")
      .withColumn("rate", lit(1.0) / col("outdeg")).drop("outdeg")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iterations) {
      val contribs = linked.join(ranks, linked("src") === ranks("node"))
        .select(linked("dst").as("node"), (col("rank") * col("rate")).as("contrib"))
        .groupBy("node").agg(sum("contrib").as("incoming"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"), (lit(1.0 - damping) + lit(damping) * coalesce(col("incoming"), lit(0.0))).as("rank"))
      if (ckptEvery > 0 && i % ckptEvery == 0 && i < iterations) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    SparkEntry.queries("q1_agg")(spark, d).collect()  // warmup
    val e1 = LinkGraph.wordFollowEdges(Tables.documents(spark, d), "text")
    time("edges count")(println("  edges=" + e1.count()))
    time("current (ckpt 3)")(graft.graph.PageRank.run(e1, 10, 0.85).count())
    time("no ckpt")(run2(e1, 10, 0.85, 0).count())
    time("no ckpt again")(run2(e1, 10, 0.85, 0).count())
    time("ckpt 5")(run2(e1, 10, 0.85, 5).count())
    spark.stop()
  }
}
