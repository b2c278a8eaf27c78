package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic batch-gradient logistic regression — the trainable
  * QUALITY-CLASSIFIER step of a curation pipeline (fastText-style
  * gates distilled from labeled examples; the label is any boolean
  * column, the features any numeric columns).
  *
  * Determinism contract (the e7 k-means recipe applied to a linear
  * model): weights live as e6-scaled INTEGERS between rounds, and
  * each row's per-feature gradient contribution is e6-floored before
  * the sum — so the only cross-engine float work is one exp() per
  * (row, round) with the result immediately quantized (the d19 ln
  * precedent), and every aggregation is exact integer arithmetic,
  * immune to partition/merge order. Feature standardization
  * quantizes to e6 integers FIRST, so means/variances come from
  * exact decimal sums (sqrt is IEEE correctly-rounded — bit-equal
  * everywhere).
  *
  * Scale shape: one partial-agg exchange per round producing a
  * SINGLE row of dims+1 values; the weight handoff to the next
  * round's expressions is a bounded O(dims) driver scalar — the same
  * class as e7's k×dims centroid handoff. Standardization is one
  * more single-row aggregate broadcast back. Scoring is pure
  * map-side column math. No window, no collect of data rows.
  */
object LogReg {

  /** e6-quantized standardization: each feature becomes
    * (floor(x·1e6 + 0.5) − mean) / std with mean/std derived from
    * EXACT sums (decimal(38) — overflow-safe at any corpus size) of
    * the quantized values. Output columns are `<f>_std`; all input
    * columns pass through. GD with a shared learning rate needs
    * comparably-scaled features — raw small-rational features leave
    * the optimizer bias-dominated (measured: unscaled training never
    * crossed the 0.5 threshold on the minority class).
    */
  def standardizeE6(features: DataFrame, cols: Seq[String]): DataFrame = {
    val passThrough = features.columns.map(col).toSeq
    val qdf = features.select(passThrough ++ cols.map(f =>
      floor(col(f) * lit(1000000) + lit(0.5)).cast("long").as(s"_q_$f")): _*)
    val aggs = cols.flatMap(f => Seq(
      sum(col(s"_q_$f").cast("decimal(38,0)")).as(s"_s_$f"),
      sum((col(s"_q_$f") * col(s"_q_$f")).cast("decimal(38,0)"))
        .as(s"_s2_$f"))) :+ count(lit(1)).as("_n")
    val stats = qdf.agg(aggs.head, aggs.tail: _*)
    qdf.crossJoin(broadcast(stats)).select(passThrough ++ cols.map { f =>
      val mean = col(s"_s_$f").cast("double") / col("_n")
      ((col(s"_q_$f") - mean) /
        sqrt(col(s"_s2_$f").cast("double") / col("_n") - mean * mean))
        .as(s"${f}_std")
    }: _*)
  }

  /** p = sigmoid((Σ_j wE6_j · x_j) / 1e6) as a Column; term order is
    * the left-associative fold both engines mirror.
    */
  private def pCol(featureCols: Seq[String], wE6: Array[Long]) = {
    val z = featureCols.zipWithIndex
      .map { case (f, j) => lit(wE6(j)) * col(f) }
      .reduce(_ + _) / lit(1000000.0)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** `rounds` of full-batch gradient ascent on the log-likelihood:
    * w_j ← w_j + floor(lrNum · Σ_i floor((y_i − p_i)·x_ij·1e6 + 0.5)
    * / n + 0.5), starting from w = 0. `labelCol` must be 0.0/1.0.
    *
    * @return the learned e6 weights, one per feature column
    */
  def train(features: DataFrame, featureCols: Seq[String],
      labelCol: String, rounds: Int, lrNum: Long = 1L): Array[Long] = {
    var w = Array.fill(featureCols.size)(0L)
    for (_ <- 1 to rounds) {
      val p = pCol(featureCols, w)
      val aggs = featureCols.zipWithIndex.map { case (f, j) =>
        sum(floor((col(labelCol) - p) * col(f) * lit(1000000) + lit(0.5))
          .cast("long")).as(s"g$j")
      } :+ count(lit(1)).as("n")
      val row = features.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getAs[Long]("n")
      w = w.zipWithIndex.map { case (wj, j) =>
        wj + math.floor((lrNum * row.getAs[Long](s"g$j")).toDouble / n
          + 0.5).toLong
      }
    }
    w
  }

  /** Map-side scoring with trained weights: adds `p_e6` (e6-floored
    * predicted probability) and `pred` (threshold 0.5, compared on
    * the INTEGER so the cut is rounding-rule-free).
    */
  def score(features: DataFrame, featureCols: Seq[String],
      wE6: Array[Long]): DataFrame = {
    val pE6 = floor(pCol(featureCols, wE6) * lit(1000000) + lit(0.5))
      .cast("long")
    features
      .withColumn("p_e6", pE6)
      .withColumn("pred", when(col("p_e6") >= 500000, 1).otherwise(0))
  }
}
