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
}
