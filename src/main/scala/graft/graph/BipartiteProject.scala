package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKByScore.top_k_by_score
import graft.operators.Checkpointing.CutOps

/** Bipartite projection with a per-entity degree cap: fold a
  * (user, item) visit log onto the item–item CO-VISITATION graph —
  * edge weight = number of users who visited both items. The
  * item-to-item similarity backbone behind "people who viewed X also
  * viewed Y" and session-based recommenders.
  *
  * The scale hazard of a naive projection is the HEAVY USER: pair
  * generation is Σ_u C(d(u), 2), so one crawler account touching 10⁵
  * items emits 5·10⁹ pairs. The standard production guard caps each
  * user's contribution at their `maxItemsPerUser` MOST-VISITED items
  * (ties to the smaller item id) — an explicit, parameterized
  * semantic (the d2 `maxShingleDf` discipline: the cap is part of
  * the operator's contract and the oracle, never a silent
  * truncation). Pair fan-out is then ≤ C(cap, 2) per user, making
  * the projection linear in users.
  *
  * Plan shape: one exchange on (user, item) builds visit counts with
  * map-side partials; the cap is the bounded-heap
  * [[graft.functions.TopKByScore]] aggregate per user (state = cap
  * entries — never a full sort of a user's items); the pair self-join
  * is co-partitioned on the user key; the final (item_a, item_b)
  * aggregation partial-aggregates map-side onto the item-pair grid.
  *
  * @param visits one row per visit event: (`userCol`, `itemCol`) —
  *   `itemCol` must be integral (the heap aggregate's id slot)
  * @param minSupport drop pairs below this co-visitor count (noise
  *   floor; 1 keeps everything)
  * @return (item_a, item_b, n_users) with item_a < item_b
  */
object BipartiteProject {

  def covisit(visits: DataFrame, userCol: String, itemCol: String,
      maxItemsPerUser: Int, minSupport: Long): DataFrame = {
    val counts = visits.groupBy(userCol, itemCol)
      .agg(count(lit(1)).as("v"))
    val capped = counts.groupBy(userCol)
      .agg(top_k_by_score(col("v").cast("double"), col(itemCol),
        lit(0L), maxItemsPerUser).as("tk"))
      .select(col(userCol).as("u"), explode(col("tk")).as("s"))
      .select(col("u"), col("s.cand_id").as("item"))
      // Read twice (both pair-join legs): cut once so the count
      // aggregation and the heap never run twice (the Triangles
      // oriented-edge discipline; blocks self-release with the RDD).
      .lineageCut
    capped.as("x").join(capped.as("y"), Seq("u"))
      .filter(col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minSupport)
  }
}
