package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table writer: the persistent co-partitioning that makes
  * repeated fact-fact joins shuffle-free.
  *
  * Two tables bucketed on the same key into the same bucket count
  * join WITHOUT an exchange — each bucket pair meets directly in a
  * sort-merge join task. At 100 TB this converts the dominant cost
  * of every downstream join/aggregation on that key (a full-data
  * shuffle) into a one-time cost paid at write. `sortBy` inside the
  * bucket additionally lets the join skip its sort phase and gives
  * parquet row-group stats their selectivity.
  *
  * Bucketing requires the table catalog (`saveAsTable`) — bucket
  * metadata lives in the metastore, not the files.
  */
object Bucketed {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    writeBucketed(df, table, Seq(bucketCol), buckets)

  /** Composite-key form: joins must list the keys in the same order
    * as `bucketCols` to inherit the table's HashPartitioning.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}
