package graft

import java.sql.Timestamp

import graft.operators.RangeJoinBinned

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("containment pairs appear exactly once incl. multi-bin intervals") {
    val points = Seq((1L, 1L, ts(10)), (2L, 1L, ts(100)), (3L, 1L, ts(200)),
      (4L, 2L, ts(10)))
      .toDF("pid", "user_id", "ts")
    // interval A spans many 30-min bins (0..180); B is a point-ish one.
    val intervals = Seq((1L, "A", ts(0), ts(180)), (1L, "B", ts(195), ts(205)),
      (2L, "C", ts(20), ts(30)))
      .toDF("user_id", "name", "s", "e")
    val got = RangeJoinBinned(points, "ts", intervals, "s", "e",
        binMicros = 30L * 60000000L, keyCols = Seq("user_id"))
      .select("pid", "name").as[(Long, String)].collect().toSet
    // p1@10, p2@100 inside A (multi-bin; joined once each); p3@200 in
    // B; p4@10 for user 2 precedes C (no match). Boundary: A's end at
    // 180 would include a point at exactly 180 (inclusive).
    assert(got == Set((1L, "A"), (2L, "A"), (3L, "B")))
  }

  test("randomized: equals the brute-force containment join") {
    val rnd = new scala.util.Random(21L)
    for (round <- 1 to 5) {
      val nKeys = 1 + rnd.nextInt(4)
      val points = (1 to 1 + rnd.nextInt(50)).map(i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(300).toLong)))
      val intervals = (1 to 1 + rnd.nextInt(20)).map { i =>
        val s = rnd.nextInt(280)
        (rnd.nextInt(nKeys).toLong, s"iv$i",
          ts(s.toLong), ts((s + rnd.nextInt(80)).toLong))
      }
      // Bin size deliberately unaligned with the data's granularity.
      val got = RangeJoinBinned(
        points.toDF("pid", "user_id", "ts"),
        "ts", intervals.toDF("user_id", "name", "s", "e"), "s", "e",
        binMicros = 17L * 60000000L, keyCols = Seq("user_id"))
        .select("pid", "name").as[(Long, String)].collect().sorted.toSeq
      val want = (for {
        (pid, pk, pt) <- points
        (ik, name, s, e) <- intervals
        if ik == pk && !pt.before(s) && !pt.after(e)
      } yield (pid, name)).sorted
      assert(got == want, s"round $round: nKeys=$nKeys")
    }
  }

  test("boundary timestamps are inclusive on both ends") {
    val points = Seq((1L, ts(50)), (2L, ts(60))).toDF("pid", "ts")
      .withColumn("k", org.apache.spark.sql.functions.lit(1L))
    val intervals = Seq((ts(50), ts(60))).toDF("s", "e")
      .withColumn("k", org.apache.spark.sql.functions.lit(1L))
    val got = RangeJoinBinned(points, "ts", intervals, "s", "e",
        binMicros = 7L * 60000000L, keyCols = Seq("k"))
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }
}
