package graft

import org.apache.spark.sql.functions._

import graft.functions.SegEnumAll.seg_enum

/** Kernel-equivalence pin for the compiled segmentation enumerator
  * ([[graft.functions.SegEnumAll]]) against the interpreted
  * `sequence`-explode + `filter`/`transform`/`substring`/`array_join`
  * chain it replaced in UnigramLm.scoredSegs (round-16 optimization)
  * — every (word, np, segstr, pieces) row identical, including the
  * multi-byte-character corner (Spark substring counts code points).
  */
class SegEnumSpec extends SparkSpec {
  import spark.implicits._

  test("seg_enum kernel == interpreted mask-enumeration chain") {
    val words = Seq("a", "ab", "aab", "banana", "abcdefgh",
      "ééxé", "mississippi1", "zzzzzzzzzzzz").toDF("w")
    for (minPieces <- Seq(1, 2)) {
      val got = words
        .select(col("w"), explode(seg_enum(col("w"), minPieces)).as("m"))
        .select(col("w"), col("m.np").as("np"),
          col("m.segstr").as("segstr"),
          expr("array_join(m.ps, '|')").as("pj"))
        .as[(String, Long, String, String)].collect().toSeq.sorted
      val want = words
        .withColumn("len", length(col("w")).cast("int"))
        .withColumn("mask", explode(expr(
          "sequence(0L, shiftleft(1L, len - 1) - 1)")))
        .withColumn("cuts", expr(
          """concat(array(0),
            |  if(len >= 2, filter(sequence(1, len - 1),
            |    t -> (mask div shiftleft(1L, t - 1)) % 2 = 1),
            |    array()),
            |  array(len))"""
            .stripMargin.replaceAll("\n\\s*", " ")))
        .withColumn("np", (size(col("cuts")) - 1).cast("long"))
        .filter(col("np") >= minPieces)
        .withColumn("ps", expr(
          """transform(sequence(1, cast(np as int)),
            |  i -> substring(w, element_at(cuts, i) + 1,
            |    element_at(cuts, i + 1) - element_at(cuts, i)))"""
            .stripMargin.replaceAll("\n\\s*", " ")))
        .select(col("w"), col("np"),
          array_join(col("ps"), " ").as("segstr"),
          expr("array_join(ps, '|')").as("pj"))
        .as[(String, Long, String, String)].collect().toSeq.sorted
      assert(got == want, s"minPieces=$minPieces: kernel diverges " +
        s"from the HOF chain (${got.size} vs ${want.size} rows)")
      // Non-vacuous: the 12-char word contributes 2^11 masks.
      assert(got.count(_._1 == "zzzzzzzzzzzz") ==
        (if (minPieces == 1) 2048 else 2047))
    }
  }
}
