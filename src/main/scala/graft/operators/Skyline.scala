package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) per group: the rows no other row of
  * the same group beats on BOTH axes — (smaller-or-equal `xCol`,
  * larger-or-equal `yCol`, strictly better on at least one). The
  * classic multi-criteria shortlist ("earliest and priciest", or with
  * negated axes "cheapest and fastest").
  *
  * Plan, in two passes:
  *   1. COARSE PRE-PRUNE — per (group, `bucketCol`) max y, running max
  *      over strictly earlier buckets (a bounded grid: groups ×
  *      buckets, broadcast back). Any row whose y falls below the best
  *      y of an earlier bucket is dominated by that bucket's witness
  *      (its x is strictly smaller, bucket boundaries being x-ordered)
  *      and is discarded before the exact pass. Dominance is
  *      transitive, so removing provably-dominated rows never changes
  *      the frontier computed on the survivors.
  *   2. EXACT RANGE WINDOWS over the surviving sliver — m1 = max y at
  *      any strictly smaller x, m2 = max y up to the same x; frontier
  *      ⇔ m1 < y AND m2 ≤ y (ties on both axes stay, same-x lower-y
  *      rows fall to m2).
  *
  * Scale shape: pass 1 is one partial-agg exchange on the (group,
  * bucket) grid plus a broadcast join — the full input is never
  * sorted. Pass 2's per-group sort sees only the pre-pruned rows;
  * on sorted-by-x data distributions that is O(frontier), not O(n).
  * A low-cardinality `groupCol` (the q62 market segments) would
  * otherwise funnel the whole input through a handful of sort tasks.
  *
  * `xCol` must be integral (day numbers, not dates — range frames
  * need a numeric order key); `bucketCol` any coarsening of x that is
  * monotone in it (same bucket ⇒ no cross-bucket claim is made).
  *
  * NULL contract: `xCol`/`yCol`/`bucketCol` must be non-null. A
  * NULL-y row is never dominated under the stated rule, but the
  * null-rejecting pre-prune comparison (and the inner equi-join on
  * `bucketCol`) silently DROPS such rows instead of surfacing them —
  * so callers must filter or impute nulls first, exactly as q62's
  * inputs do. (Same class of requirement as the integral-xCol note
  * above: the operator states its domain rather than guessing an
  * imputation.)
  */
object Skyline {

  def frontier2d(rows: DataFrame, groupCol: String, xCol: String,
      yCol: String, bucketCol: String): DataFrame = {
    val coarse = rows.groupBy(groupCol, bucketCol)
      .agg(max(yCol).as("_sky_mp"))
    val wBucket = Window.partitionBy(groupCol).orderBy(bucketCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = coarse.select(col(groupCol), col(bucketCol),
      max("_sky_mp").over(wBucket).as("_sky_pm"))
    val cand = rows.join(broadcast(prev), Seq(groupCol, bucketCol))
      .filter(col("_sky_pm").isNull || col(yCol) >= col("_sky_pm"))
    val w1 = Window.partitionBy(groupCol).orderBy(xCol)
      .rangeBetween(Window.unboundedPreceding, -1)
    val w2 = Window.partitionBy(groupCol).orderBy(xCol)
      .rangeBetween(Window.unboundedPreceding, 0)
    cand
      .withColumn("_sky_m1", max(yCol).over(w1))
      .withColumn("_sky_m2", max(yCol).over(w2))
      .filter((col("_sky_m1").isNull || col("_sky_m1") < col(yCol))
        && col("_sky_m2") <= col(yCol))
      .drop("_sky_pm", "_sky_m1", "_sky_m2")
  }
}
