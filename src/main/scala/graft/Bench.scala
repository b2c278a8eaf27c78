package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline query set
  * (SURVEY.md §6) on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * One short warm-up job runs first so JVM/codegen startup cost is
  * not attributed to the first measured query; each headline query
  * then executes once, timed end-to-end including its full action.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "pr_ranks", "q1_agg", "q3_topk_join", "q18_sessionize",
    "d3_minhash_lsh", "e1_ann_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark: SparkSession = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: small end-to-end job (scan + agg + shuffle) to load
    // parquet reader, codegen and shuffle machinery.
    SparkEntry.queries("q1_agg")(spark, sfDir).collect()

    val results = headline.map { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-16s $sec%8.3f s  ($n rows)")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
