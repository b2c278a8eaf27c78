package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKByScore.top_k_by_score

/** Pins the bounded-heap top-k aggregate to the row_number-window
  * semantics it replaces: (score DESC, id ASC) order, NaN-greatest,
  * stability under partial/merge across many partitions.
  */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  private def explodeTopK(grouped: org.apache.spark.sql.DataFrame) =
    grouped
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("s.cand_id").as("id"), col("s.sim").as("score"))

  test("matches the row_number window formulation across partitions") {
    // Deterministic pseudo-random scores, 3 groups × 200 rows, spread
    // over 7 partitions so partial heaps really merge.
    val rows = for (g <- 1 to 3; i <- 1L to 200L)
      yield (g, i, ((i * 2654435761L + g * 40503L) % 1000L).toDouble / 10.0)
    val df = rows.toDF("g", "id", "score").repartition(7)

    val viaAgg = explodeTopK(
      df.groupBy("g").agg(top_k_by_score(col("score"), col("id"), lit(0L), 5).as("tk")))
      .as[(Int, Int, Long, Double)].collect().toSet

    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("g"), col("rank"), col("id"), col("score"))
      .as[(Int, Int, Long, Double)].collect().toSet

    assert(viaAgg == viaWindow)
  }

  test("randomized: equals the window formulation for arbitrary shapes") {
    // 8 seeded-random datasets sweeping the regimes that stress the
    // heap merge differently: k larger/smaller than group size, heavy
    // score ties, many tiny groups, one giant group, varied partition
    // counts. Equality must hold exactly in every case.
    val rnd = new scala.util.Random(20260812L)
    for (round <- 1 to 8) {
      val nGroups = 1 + rnd.nextInt(20)
      val maxRows = 1 + rnd.nextInt(120)
      val k = 1 + rnd.nextInt(12)
      val tieSpread = 1 + rnd.nextInt(30) // small => many exact ties
      val rows = for {
        g <- 1 to nGroups
        _ <- 1 to (1 + rnd.nextInt(maxRows))
      } yield (g, rnd.nextLong(1000000L), rnd.nextInt(tieSpread).toDouble)
      val df = rows.distinct.toDF("g", "id", "score")
        .repartition(1 + rnd.nextInt(9))

      val viaAgg = explodeTopK(
        df.groupBy("g").agg(
          top_k_by_score(col("score"), col("id"), lit(0L), k).as("tk")))
        .as[(Int, Int, Long, Double)].collect().toSet
      val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
      val viaWindow = df
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("g"), col("rank"), col("id"), col("score"))
        .as[(Int, Int, Long, Double)].collect().toSet
      assert(viaAgg == viaWindow,
        s"round $round: nGroups=$nGroups k=$k tieSpread=$tieSpread")
    }
  }

  test("ties break by ascending id; short groups return all rows") {
    val df = Seq((1, 10L, 2.0), (1, 3L, 2.0), (1, 7L, 2.0), (1, 1L, 1.0))
      .toDF("g", "id", "score")
    val got = explodeTopK(
      df.groupBy("g").agg(top_k_by_score(col("score"), col("id"), lit(0L), 10).as("tk")))
      .as[(Int, Int, Long, Double)].collect().sortBy(_._2)
    assert(got.map(r => (r._2, r._3)).toSeq ==
      Seq((1, 3L), (2, 7L), (3, 10L), (4, 1L)))
  }

  test("NaN scores rank first (NaN-greatest, matching sort order)") {
    val df = Seq((1, 1L, 5.0), (1, 2L, Double.NaN), (1, 3L, 9.0))
      .toDF("g", "id", "score")
    val got = explodeTopK(
      df.groupBy("g").agg(top_k_by_score(col("score"), col("id"), lit(0L), 2).as("tk")))
      .select("rank", "id").as[(Int, Long)].collect().toSet
    assert(got == Set((1, 2L), (2, 3L)))
  }

  test("tag rides along unordered and k bounds the output") {
    val df = Seq((1, 1L, 1.0, 100L), (1, 2L, 3.0, 200L), (1, 3L, 2.0, 300L))
      .toDF("g", "id", "score", "tag")
    val got = df.groupBy("g")
      .agg(top_k_by_score(col("score"), col("id"), col("tag"), 2).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("s.cand_id"), col("s.tag")).as[(Long, Long)]
      .collect().toSeq
    assert(got == Seq((2L, 200L), (3L, 300L)))
  }

  test("SQL registration: top_k_by_score usable from spark.sql") {
    Seq((1, 1L, 1.5), (1, 2L, 2.5), (1, 3L, 0.5))
      .toDF("g", "id", "score").createOrReplaceTempView("tk_sql_t")
    val got = spark.sql(
      """SELECT s.cand_id FROM (
        |  SELECT top_k_by_score(score, id, 0L, 2) AS tk
        |  FROM tk_sql_t GROUP BY g
        |) LATERAL VIEW explode(tk) AS s""".stripMargin)
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 1L))
  }
}
