package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-layout-aware parquet writer for pipeline outputs.
  *
  * At 100 TB the write layout IS the downstream read plan:
  *   - `partitionBy` on a low-cardinality column (e.g. event date)
  *     gives Hive-style directories → partition PRUNING on read: a
  *     date-filtered query opens only its directories.
  *   - repartitioning by the partition columns BEFORE the write makes
  *     each task own whole partitions — without it, every one of the
  *     shuffle's N tasks appends a file to every partition directory
  *     (N×P small files, the classic small-file explosion).
  *   - `sortWithinPartitions` on a frequent filter key gives parquet
  *     row-group min/max statistics their selectivity: a sorted
  *     column's row groups have disjoint ranges, so a point/range
  *     filter skips whole row groups at scan time.
  */
object ParquetSink {

  /** Write `df` Hive-partitioned by `partCols`, files clustered so
    * each output partition directory is written by one task, rows
    * sorted within files by `sortCols` for row-group skipping.
    */
  def writePartitioned(df: DataFrame, path: String,
      partCols: Seq[String], sortCols: Seq[String]): Unit =
    df
      .repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write
      .mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(path)

  /** Token-budgeted SHARD export — the final step of a training
    * pipeline: write the curated corpus as ≈`tokensPerShard`-token
    * shards, one file per shard, each internally ordered by
    * `idCol`. The shard count derives from ONE total-token aggregate
    * (a bounded driver scalar) and assignment is the deterministic
    * content hash `idCol → shard` — no global sort, no
    * coordination; shard token sums concentrate around the budget by
    * the law of large numbers (exact budgets would need a global
    * running total, the one thing that can't scale). Returns the
    * shard count. Hive layout `shard=K/` so a trainer reading one
    * shard opens exactly one directory (partition pruning).
    *
    * @param tokenCol integer token count column, precomputed by the
    *   caller (whitespace, BPE — the sink doesn't care)
    * @param shuffled when true, rows inside each shard are written
    *   in [[graft.operators.Sampling.shuffleOrder]]'s deterministic
    *   training order (the mixed id hash, tie-broken by id) instead
    *   of id order — the d65 composition: shard assignment already
    *   scatters ids ACROSS shards off the same mixed hash, this
    *   scrambles the order WITHIN each file too, so a trainer
    *   streaming shards in sequence never sees crawl-correlated
    *   neighbors. Same cost: the within-partition sort just changes
    *   key.
    */
  def writeTokenShards(df: DataFrame, path: String, idCol: String,
      tokenCol: String, tokensPerShard: Long,
      shuffled: Boolean = false): Int = {
    require(tokensPerShard > 0, s"bad budget $tokensPerShard")
    // coalesce: sum() of zero rows is NULL — an empty input writes a
    // single empty shard instead of NPE-ing on the driver scalar.
    val total = df.agg(coalesce(sum(col(tokenCol)), lit(0L)).cast("long"))
      .head().getLong(0)
    val n = math.max(1L, math.ceil(
      total.toDouble / tokensPerShard).toLong).toInt
    // Shard off the FULL 32-bit mixed hash (Sampling.mixedKey), not
    // Sampling.hashBucket: hashBucket reduces mod 10 000 for
    // sampling, so `bucket % n` could never produce more than 10 000
    // distinct shards (a 100 TB corpus at the 1M-token default needs
    // ~10⁸) and the double modulo skews shard sizes whenever
    // n ∤ 10 000.
    val mixed = graft.operators.Sampling.mixedKey(col(idCol))
    val sortCols =
      if (shuffled) Seq(col("shard"), mixed, col(idCol))
      else Seq(col("shard"), col(idCol))
    df
      .withColumn("shard", mixed % n)
      .repartition(n, col("shard"))
      .sortWithinPartitions(sortCols: _*)
      .write
      .mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
    n
  }
}
