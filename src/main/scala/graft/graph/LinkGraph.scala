package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text → directed-graph extraction (the Spark-first re-expression of
  * the reference's linkGraphJob, /root/reference/PageRank.java:371-430,
  * which regex-scanned wiki markup for `<title>` and `[[outlink]]`).
  *
  * Two extractors:
  *   - [[parseWikiPages]]: the reference's exact wiki-markup shape —
  *     one page per row, title from `<title>(.*?)</title>`, outlinks
  *     from `\[\[(.*?)\]\]` inside `<text…</text>`.
  *   - [[wordFollowEdges]]: the engine's general `text → edges`
  *     extractor over plain text — an edge per adjacent word pair.
  *
  * Both are pure `functions._` column pipelines: the regexes and array
  * ops run inside whole-stage codegen, and Catalyst prunes the scan to
  * the single text column.
  */
object LinkGraph {

  /** Reference wiki extraction: rows with a `page` column of wiki
    * markup → (title, outlink) rows, one per outlink occurrence.
    */
  def parseWikiPages(pages: DataFrame, pageCol: String): DataFrame =
    pages
      .select(
        regexp_extract(col(pageCol), "<title>(.*?)</title>", 1).as("title"),
        // Reference scopes link-scanning to the <text…</text> body.
        regexp_extract(col(pageCol), "<text(.*?)</text>", 1).as("body"))
      .filter(col("title") =!= "")
      .select(
        col("title"),
        explode(expr("regexp_extract_all(body, '\\\\[\\\\[(.*?)\\\\]\\\\]', 1)"))
          .as("outlink"))

  /** Plain-text graph: distinct (src, dst) edges where dst immediately
    * follows src in the whitespace-tokenized text.
    */
  def wordFollowEdges(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(split(trim(col(textCol)), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2)," +
          " i -> struct(w[i] as src, w[i + 1] as dst))")).as("e"))
      .select(col("e.src"), col("e.dst"))
      .distinct()

  /** Out-degree per source node. */
  def outDegrees(edges: DataFrame): DataFrame =
    edges.groupBy("src").agg(count("*").as("outdeg"))

  /** Weighted plain-text graph: (src, dst, weight) where weight is the
    * number of times dst immediately follows src across the corpus —
    * the co-occurrence multiplicity [[wordFollowEdges]] discards.
    */
  def wordFollowWeighted(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(split(trim(col(textCol)), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2)," +
          " i -> struct(w[i] as src, w[i + 1] as dst))")).as("e"))
      .groupBy(col("e.src").as("src"), col("e.dst").as("dst"))
      .agg(count(lit(1)).as("weight"))
}
