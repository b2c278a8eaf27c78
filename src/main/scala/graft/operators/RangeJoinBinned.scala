package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment join (point ts ∈ [start, end]) via time
  * binning — the scale shape for range joins.
  *
  * Spark plans a raw `l.ts BETWEEN r.start AND r.end` predicate as a
  * broadcast nested-loop or cross join: every (point, interval) pair
  * is tested. Binning makes it an EQUI-join: points key on their
  * time bin, intervals explode to every bin they overlap, the join
  * runs hash-partitioned on (keys…, bin), and the exact BETWEEN
  * filter runs only on bin-colliding pairs. A point's bin is unique
  * and an interval lists each bin once, so containment pairs emerge
  * exactly once — no distinct needed.
  *
  * `binMicros` trades explode factor against bucket selectivity:
  * ≈ the typical interval length is right (each interval lands in
  * 1–2 bins). Callers ensure column names are disjoint apart from
  * `keyCols` (joined by name).
  */
object RangeJoinBinned {

  def apply(points: DataFrame, tsCol: String, intervals: DataFrame,
      startCol: String, endCol: String, binMicros: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val p = points.withColumn("_bin",
      floor(unix_micros(col(tsCol)) / binMicros))
    val iv = intervals.withColumn("_bin",
      explode(sequence(
        floor(unix_micros(col(startCol)) / binMicros),
        floor(unix_micros(col(endCol)) / binMicros))))
    p.join(iv, keyCols :+ "_bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }
}
