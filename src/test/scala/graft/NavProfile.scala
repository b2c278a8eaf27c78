package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}

/** Profiling harness (dev tool, not part of the library): stage-level
  * timing of the nav-build family's shared chain — the round-16
  * optimization round's measure-first step (guide §1). The nav family
  * (e28/e41/e46/e49/e52/e53) is 53% of the sf0.1 bench total; this
  * harness splits one build into its sequential stages and times each
  * with the noop sink so the expensive stage is measured, not guessed.
  *
  * Run: sbt "Test/runMain graft.NavProfile [sfDir] [cpus]"
  */
object NavProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, reps: Int = 3)(body: => Unit): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(label)
        body
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.size / 2)
      println(f"[navprof] $label%-34s median $med%7.3f s  " +
        ts.map(t => f"$t%.3f").mkString("(", ", ", ")"))
      med
    }

    val emb = Tables.embeddings(spark, sfDir)
    // warm-up
    noop(emb); noop(emb)
    println(s"[navprof] corpus rows = ${emb.count()}")

    time("scan: emb noop") { noop(emb) }

    // --- trainedCells stages ---
    val e2 = emb.withColumn("embedding",
      expr("transform(embedding, v -> cast(v as double))"))
    time("tc: count()") { e2.count() }
    val n = e2.count()
    val k = Math.toIntExact(math.max(8L, (n + 249) / 250))
    time("tc: KMeans.train (seeds+3it+cut)") { KMeans.train(e2, k, 3) }
    val cents = KMeans.train(e2, k, 3)
    time("tc: withCells assign noop") {
      noop(KMeans.withCells(e2, cents))
    }
    val tc = Similarity.trainedCells(emb)
    time("tc: full trainedCells noop", 2) { noop(tc) }

    // --- knnGraphProbed stages (over an already-built tc value) ---
    time("knn: centroidVectors collect") {
      Similarity.centroidVectors(tc, "cell").collect()
    }
    val knn = Similarity.knnGraphProbed(tc, "cell", k = 16, nprobe = 2)
    time("knn: knnGraphProbed noop", 2) { noop(knn) }

    // --- navigableGraph stages (inline mirror of its internals) ---
    val edges = knn.select(col("vec_id"), col("nbr_id"))
    val sym = edges
      .union(edges.select(col("nbr_id").as("vec_id"),
        col("vec_id").as("nbr_id")))
      .distinct()
    time("nav: symmetrize noop", 2) { noop(sym) }
    val en = emb.select(col("vec_id"),
        expr("transform(embedding, v -> cast(v as double))").as("e"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), " +
          "cast(0 as double), (s, v) -> s + v))"))
    import graft.functions.CosineSimilarity.cosine_sim
    import graft.functions.TopKByScore.top_k_by_score
    val sel = sym
      .join(en.select(col("vec_id"), col("e").as("ea")), "vec_id")
      .join(en.select(col("vec_id").as("nbr_id"), col("e").as("eb")),
        "nbr_id")
      .withColumn("se",
        floor(cosine_sim(col("ea"), col("eb")) * 1000000 + 0.5)
          .cast("long"))
      .groupBy("vec_id")
      .agg(top_k_by_score(col("se").cast("double"), col("nbr_id"),
        lit(0L), 32).as("tk"))
      .select(col("vec_id"), explode(col("tk")).as("t"))
      .select(col("vec_id"), col("t.cand_id").as("nbr_id"),
        col("t.sim").cast("long").as("se"))
    time("nav: scored+truncated sel noop", 2) { noop(sel) }
    val nav = Similarity.navigableGraph(emb, edges)
    time("nav: full navigableGraph noop", 2) { noop(nav) }

    // --- the full headline compositions, bench-style ---
    def full(name: String): Unit = {
      time(s"FULL $name toRdd", 2) {
        SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.toRdd.count()
      }
    }
    full("e28_nav_graph")
    full("e41_filtered_graph_ann")
    full("e46_hier_graph")
    full("e49_pq_nav")
    full("e52_nav_compact")
    full("e53_nav_delete")

    // e41 decomposition: medoids and the walk
    time("e41: cellMedoids collect-side noop", 2) {
      noop(Similarity.cellMedoids(tc, "cell"))
    }

    spark.stop()
  }
}
