package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the boilerplate-strip pass a web-crawl
  * training pipeline runs before any quality/dedup stage (the WET
  * step of a Common-Crawl-style flow).
  *
  * Everything is codegen'd `regexp_replace`/`replace` column
  * expressions (no UDF): script/style subtree removal, comment
  * removal, tag strip, core entity decode, whitespace collapse. The
  * same five steps are expressible verbatim in the DuckDB oracle
  * (`'g'` flag), which keeps d31 hash-checkable. Regex subset is
  * RE2-and-Java-common: lazy quantifiers, `(?is)` flags, `\b`, no
  * backreferences; whitespace is the explicit `[ \t\n\r]` class
  * because Java's `\s` and RE2's `\s` disagree on `\x0B`.
  *
  * Scale shape: pure map-side narrow projection — no shuffle, no
  * state; at 100 TB this is the classic embarrassingly-parallel scan
  * the whole curation DAG starts with.
  */
object HtmlExtract {

  /** Plant a deterministic HTML page around each document's text:
    * title/head chrome, a script with comparison operators (angle
    * brackets inside code), a style block, an HTML comment,
    * entity-encoded headline and link text, attributes with encoded
    * query strings, and double-space runs — every branch of the
    * extractor sees real input on every row.
    */
  def htmlTable(docs: DataFrame): DataFrame = {
    val id = col("doc_id").cast("string")
    docs.select(col("doc_id"), concat(
      lit("<html><head><title>Doc "), id,
      lit("</title> <script type=\"text/javascript\">var n = "), id,
      lit("; if (n < 10 && n > 2) { document.write(\"boiler\"); }" +
        "</script> <style>.m { margin: 0; }  p > a { color: red; }" +
        "</style></head> <body> <!-- chrome "), id,
      lit(" --> <h1 class=\"t\">Tom &amp; Jerry&#39;s &lt;finest&gt;" +
        "</h1>  <p>"), col("text"),
      lit("</p> <a href=\"/x?a=1&amp;b=2\">A &quot;link&quot;&nbsp;" +
        "here</a> </body></html>")).as("html"))
  }

  /** The extraction chain: html column in, clean text column out. */
  def extract(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    // decode the core entity set AFTER tag strip (an encoded
    // "&lt;finest&gt;" is content, not markup); &amp; strictly last
    // so already-decoded ampersands are never re-expanded
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    trim(regexp_replace(ent, "[ \\t\\n\\r]+", " "))
  }

  /** The same chain as a DuckDB SQL expression string (the oracle
    * side of d31) — step-for-step identical to [[extract]].
    */
  def oracleExtract(html: String): String = {
    val noScript =
      s"regexp_replace($html, '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g')"
    val noStyle =
      s"regexp_replace($noScript, '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g')"
    val noComment = s"regexp_replace($noStyle, '(?s)<!--.*?-->', ' ', 'g')"
    val noTags = s"regexp_replace($noComment, '<[^>]+>', ' ', 'g')"
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        s"replace($c, '$from', '$to')"
      }
    s"trim(regexp_replace($ent, '[ \\t\\n\\r]+', ' ', 'g'))"
  }

  /** The planted page as a DuckDB concat expression (mirrors
    * [[htmlTable]] byte-for-byte).
    */
  val oracleHtml: String =
    "'<html><head><title>Doc ' || doc_id || " +
      "'</title> <script type=\"text/javascript\">var n = ' || doc_id || " +
      "'; if (n < 10 && n > 2) { document.write(\"boiler\"); }" +
      "</script> <style>.m { margin: 0; }  p > a { color: red; }" +
      "</style></head> <body> <!-- chrome ' || doc_id || " +
      "' --> <h1 class=\"t\">Tom &amp; Jerry&#39;s &lt;finest&gt;" +
      "</h1>  <p>' || text || " +
      "'</p> <a href=\"/x?a=1&amp;b=2\">A &quot;link&quot;&nbsp;" +
      "here</a> </body></html>'"
}
