package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EventQueries, PageRankQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** All implemented capabilities, by block. */
  def blocks: Seq[Q] =
    PageRankQueries.all ++
      RelationalQueries.all ++
      EventQueries.all ++
      PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("pr_top20")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    blocks.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    blocks.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
