package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Checkpointing.CutOps

/** Distributed dense-id assignment: each DISTINCT key gets
  * `id` = its 1-based rank in global key order — exactly the ids a
  * single-partition `row_number() OVER (ORDER BY key)` window
  * produces (so every SQL oracle mirroring ids as a global
  * row_number is unchanged), WITHOUT the one single-task O(V log V)
  * sort stage that window serializes on.
  *
  * The two-pass per-partition-offset scheme (the RDD zipWithIndex
  * idea expressed on DataFrames):
  *
  *   1. range-partition the keys, then MATERIALIZE (eager lineage
  *      cut) — the sampled range boundaries are pinned by the
  *      materialization, so both readers below see the same
  *      placement (no pre-sort: the window re-sorts its own
  *      partitions and the counts are order-insensitive);
  *   2. per-partition row counts collect to the driver — a bounded
  *      ≤ shuffle-partitions-row handoff (the KMeans centroid
  *      class, never corpus data) — and prefix-sum into offsets;
  *   3. id = partition offset + row_number within the partition
  *      (the only window, keyed on the partition id — P-way
  *      parallel, each partition sorts only its own slice).
  *
  * Output ids are a pure function of the key SET (global rank), so
  * they are deterministic regardless of where the sampled range
  * boundaries land. Shared by every dense-id consumer in the graph
  * family (Louvain, LabelPropagation); on a bounded vocabulary it
  * costs one extra bounded collect vs the old single-partition
  * window, and on a 10⁸-node graph it removes the one straggler
  * stage from otherwise partition-once plans.
  *
  * @param keys one column of DISTINCT keys (duplicate keys would
  *   get distinct ranks in an unspecified order across a boundary)
  * @return (keyCol, id) — NOT yet lineage-cut; callers that read it
  *   more than once cut it (both graph consumers already do)
  */
object DenseIds {

  def byKey(keys: DataFrame, keyCol: String,
      idCol: String = "id"): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // No sortWithinPartitions: the counts are order-insensitive and
    // the row_number window re-sorts its _pid partitions anyway — a
    // pre-sort would only bloat the checkpoint (review finding).
    val ranged = keys.select(col(keyCol))
      .repartitionByRange(p, col(keyCol))
      .withColumn("_pid", spark_partition_id())
      .lineageCut
    val counts = ranged.groupBy("_pid").agg(count(lit(1)).as("_c"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val o = (pid, acc); acc += c; o
    }
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy("_pid").orderBy(keyCol)
    ranged.join(broadcast(offDf), "_pid")
      .withColumn(idCol,
        (col("_off") + row_number().over(w)).cast("long"))
      .select(col(keyCol), col(idCol))
  }
}
