package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot rank auditing — the d34-for-ranks member of the
  * incremental family: given two rank tables (yesterday's and
  * today's), report the top movers by absolute rank change with a
  * new / gone / moved status per node.
  *
  * Scale shape: both inputs are O(|V|) rank tables (never edges);
  * the full-outer join is one exchange and selection is
  * TakeOrderedAndProject on the e6-floored delta with a
  * deterministic node tie-break — no corpus-wide window.
  */
object RankDelta {

  /** @param previous (node, rank) — yesterday's snapshot
    * @param current (node, rank) — today's snapshot
    * @param k movers to keep
    * @return (node, status ∈ {new, gone, moved}, delta_e6) — delta is
    *   today − yesterday with absent sides as 0, e6-floored
    */
  def movers(previous: DataFrame, current: DataFrame, k: Int): DataFrame = {
    val rb = previous.select(col("node"), col("rank").as("rb"))
    val rf = current.select(col("node"), col("rank").as("rf"))
    rf.join(rb, Seq("node"), "full_outer")
      .select(col("node"),
        when(col("rf").isNull, lit("gone"))
          .when(col("rb").isNull, lit("new"))
          .otherwise(lit("moved")).as("status"),
        floor((coalesce(col("rf"), lit(0.0))
            - coalesce(col("rb"), lit(0.0))) * 1000000 + 0.5)
          .cast("long").as("delta_e6"))
      .orderBy(abs(col("delta_e6")).desc, col("node"))
      .limit(k)
  }
}
