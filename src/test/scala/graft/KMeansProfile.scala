package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeans

/** Profiling harness (dev tool, not part of the library): measures
  * whether the k-means assignment's per-row argmax FOLD — a
  * higher-order function dispatching k interpreted lambda steps per
  * row, each calling the compiled cosine — dominates at IVF-scale k,
  * to decide whether the nearest-centroid step earns the
  * TextHashExprs compiled-kernel treatment (the d3 precedent:
  * 78 s → 3-4 s once MinHash moved out of HOF dispatch).
  *
  * Run: sbt "Test/runMain graft.KMeansProfile [sfDir] [replicate]"
  * Defaults: sf0.1 embeddings (5,000 × 64-dim), replicated ×20 to
  * 100,000 rows so per-row costs dominate job overhead; k = 256.
  *
  * It times three scans of the SAME replicated corpus:
  *   1. baseline: count() over the persisted rows (scan floor),
  *   2. one compiled cosine per row (the pure-codegen floor for any
  *      per-row vector op),
  *   3. the k=256 nearest-centroid assignment (what assign() runs
  *      per iteration).
  * The HOF-fold measurement this harness produced (ratios in the
  * inline note below) is what justified replacing the fold with the
  * compiled NearestCentroidCell kernel; the harness stays so the
  * assignment cost keeps getting measured, not assumed.
  */
object KMeansProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicate = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = GraftSession.builder(
      Runtime.getRuntime.availableProcessors().toString).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"),
      expr("transform(embedding, v -> cast(v as double))").as("embedding"))
    // Replicate with distinct ids so nothing collapses.
    val corpus = base
      .crossJoin(spark.range(replicate).select(col("id").as("rep")))
      .select((col("vec_id") * replicate + col("rep")).as("vec_id"),
        col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()

    val k = 256
    val cent = KMeans.seeds(base, k) // instant deterministic centroids

    def time(label: String)(body: => Unit): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      val med = runs.sorted.apply(1)
      println(f"[profile] $label%-28s $med%8.3f s  (runs: ${
        runs.map(r => f"$r%.3f").mkString(", ")})")
      med
    }

    val tScan = time("scan (count only)") { corpus.count() }
    val oneCent = cent.limit(1)
      .agg(collect_list(struct(col("cell"), col("cvec"))).as("cents"))
    val tOne = time("1 compiled cosine / row") {
      corpus.crossJoin(broadcast(oneCent))
        .select(graft.functions.CosineSimilarity.cosine_sim(
          col("embedding"), element_at(col("cents"), 1).getField("cvec"))
          .as("c"))
        .queryExecution.toRdd.count()
    }
    // Historical result on this harness (sf0.1 ×20 = 40k rows,
    // k=256): the HOF fold measured 4.16 s net (~0.41 µs/row·cell,
    // ~10× the cosine arithmetic — dispatch dominated), which is what
    // justified building the NearestCentroidCell kernel; the kernel
    // measures ~0.46 s net (~0.045 µs/row·cell) on the same data.
    val tFold = time(s"nearest-centroid assign, k=$k") {
      KMeans.assign(corpus, cent).queryExecution.toRdd.count()
    }

    val perCosine = (tOne - tScan).max(1e-9)
    val foldWork = tFold - tScan
    println(f"[profile] rows=$n k=$k  fold=${foldWork}%.3f s  " +
      f"k x one-cosine=${k * perCosine}%.3f s  " +
      f"dispatch overhead ratio=${foldWork / (k * perCosine)}%.2f")
    spark.stop()
  }
}
