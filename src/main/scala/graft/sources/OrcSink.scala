package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC twin of [[ParquetSink]] — same partition-layout contract
  * (Hive-style directories for partition pruning, one task per
  * output partition against the small-file explosion, rows sorted
  * within files), through Spark's NATIVE ORC codepath (vectorized
  * reader, whole-stage codegen). Where parquet skips row groups off
  * min/max statistics, ORC skips STRIPES — the sortWithinPartitions
  * clustering serves the same scan-time selectivity either way, so a
  * pipeline can standardize on either format without changing its
  * layout logic.
  */
object OrcSink {

  /** Write `df` Hive-partitioned by `partCols`, files clustered so
    * each output partition directory is written by one task, rows
    * sorted within files by `sortCols` for stripe skipping.
    */
  def writePartitioned(df: DataFrame, path: String,
      partCols: Seq[String], sortCols: Seq[String]): Unit =
    df
      .repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write
      .mode("overwrite")
      .partitionBy(partCols: _*)
      .orc(path)

  /** Read an ORC table (self-describing schema, like parquet). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
