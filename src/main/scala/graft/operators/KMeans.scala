package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.CosineSimilarity.cosine_sim

/** Spherical k-means (Lloyd's algorithm, cosine assignment) over a
  * (vec_id, embedding array<double>) DataFrame — the IVF TRAINER: the
  * missing half that lets the e-series ANN family (nearest-centroid
  * probe, cell-blocked search, kNN graphs) run on an UNLABELED corpus
  * instead of ground-truth cluster labels.
  *
  * Composition of two operators that already existed: assignment is
  * the nearest-centroid rule of [[Similarity.ivfProbeTopK]], the
  * update is [[Similarity.centroidVectors]]'s per-cell mean. Seeds
  * are [[Sampling]]'s deterministic hash picks, so training is
  * reproducible across runs, engines, and partitionings, and the
  * whole loop is oracle-checkable with fixed iteration counts.
  *
  * Scale shape (per iteration):
  *   - Assignment: the k×dims centroid table collapses to ONE row
  *     holding a sorted (cell, cvec) array, broadcast to every
  *     corpus partition; each row folds over that array picking its
  *     argmax cell. ZERO shuffle — the corpus never moves. The fold
  *     is a higher-order function, so the k lambda steps dispatch
  *     interpreted, but each step's cosine is the native compiled
  *     expression (a tight JVM loop): fine for IVF-scale k (≤ a few
  *     thousand); a corpus-resident nearest-centroid KERNEL (the
  *     TextHashExprs treatment) is the next rung if profiling ever
  *     shows the dispatch dominating.
  *   - Update: posexplode to (cell, dim, v) and partial-aggregated
  *     groupBy — the one exchange, carrying ≤ partitions × k × dims
  *     partials, never corpus rows.
  *   - Centroids are rounded to 6 decimals each iteration, which
  *     collapses engine-specific float summation order and makes the
  *     feedback loop bit-reproducible (SURVEY.md §5).
  *   - Lineage stays LINEAR in iterations: each round's centroids are
  *     referenced once by the next, so no checkpoint is needed for
  *     bounded iteration counts.
  * At 100 TB, train on a [[Sampling.stratifiedSample]]-style hash
  * subset (k-means needs a representative sample, not the corpus) and
  * run [[assign]] once over the full corpus.
  */
object KMeans {

  /** Per-row nearest-centroid argmax over the broadcast (cell, cvec)
    * array: strictly-greater keeps the earliest (lowest) cell on
    * cosine ties — the same (cos DESC, cell ASC) order the oracle's
    * row_number states. cosine ≥ -1 > the -2 seed, so the fold always
    * picks a real cell. Pure Column API (the native cosine_sim
    * expression directly) — no SQL-function registration required.
    */
  private def argmaxCell(emb: Column, cents: Column): Column =
    aggregate(cents,
      struct(lit(-2.0).as("cos"), lit(-1L).as("cell")),
      (acc, c) => {
        val cs = cosine_sim(emb, c.getField("cvec"))
        when(cs > acc.getField("cos"),
          struct(cs.as("cos"), c.getField("cell").as("cell")))
          .otherwise(acc)
      },
      acc => acc.getField("cell"))

  /** Deterministic seeds: the k vectors with the smallest
    * (samplingHash(vec_id), vec_id) — a TakeOrderedAndProject, never
    * a full sort — numbered cell 0..k-1 in that order (the window
    * runs over the k seed rows only).
    */
  def seeds(emb: DataFrame, k: Int): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
        Sampling.hashBucket(col("vec_id")).as("_b"))
      .orderBy(col("_b"), col("vec_id"))
      .limit(k)
      .withColumn("cell",
        (row_number().over(Window.orderBy(col("_b"), col("vec_id"))) - 1)
          .cast("long"))
      .select(col("cell"), col("embedding").as("cvec"))

  private def assignedWithEmb(corpus: DataFrame,
      centroids: DataFrame): DataFrame = {
    val centArr = centroids.agg(
      array_sort(collect_list(struct(col("cell"), col("cvec")))).as("cents"))
    corpus.crossJoin(broadcast(centArr))
      .withColumn("cell", argmaxCell(col("embedding"), col("cents")))
      .drop("cents")
  }

  /** (vec_id, cell): each vector's nearest centroid by cosine. */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignedWithEmb(corpus, centroids).select("vec_id", "cell")

  /** Run `iters` Lloyd iterations from the deterministic seeds.
    * @return (cell, cvec array<double>) learned centroids — cells
    *   that lose all members along the way drop out (both engines
    *   mirror this; with hash-spread seeds it is rare in practice).
    */
  def train(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val corpus = emb.select("vec_id", "embedding")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cent = seeds(corpus, k)
    for (_ <- 1 to iters) {
      val a = assignedWithEmb(corpus, cent)
      cent = Similarity.centroidVectors(
          a.select(col("cell").as("label"), col("embedding")), "label")
        .select(col("label").as("cell"), col("cvec"))
    }
    // Training is inherently an action-driven loop, so run it HERE:
    // the eager localCheckpoint materializes the k-row centroid table
    // once (every later action reads k stored rows instead of
    // re-running `iters` Lloyd rounds) and lets the corpus cache be
    // released now instead of leaking into the caller's session.
    val out = cent.localCheckpoint(true)
    corpus.unpersist()
    out
  }
}
