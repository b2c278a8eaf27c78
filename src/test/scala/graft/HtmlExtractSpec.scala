package graft

import org.apache.spark.sql.functions._

import graft.operators.HtmlExtract

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String): String =
    Seq(html).toDF("html")
      .select(HtmlExtract.extract(col("html")).as("t"))
      .as[String].head()

  test("script/style subtrees vanish even with angle-bracket code") {
    assert(run("<p>keep</p><script>if (a < b && c > d) x();</script>" +
      "<style>p > a { x: 1; }</style><p>tail</p>") == "keep tail")
  }

  test("entities decode AFTER tag strip — encoded markup is content") {
    assert(run("<b>Tom &amp; Jerry&#39;s &lt;finest&gt;</b>") ==
      "Tom & Jerry's <finest>")
    // double-encoded: &amp;lt; must become the TEXT "&lt;", not "<"
    assert(run("x &amp;lt; y") == "x &lt; y")
  }

  test("comments, attributes, and whitespace runs collapse") {
    assert(run("<!-- chrome -->  a  <a href=\"/x?a=1&amp;b=2\">b</a>\n\tc") ==
      "a b c")
  }
}
