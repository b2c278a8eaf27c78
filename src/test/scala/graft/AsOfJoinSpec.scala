package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("attaches the latest at-or-before right row per key") {
    val left = Seq(
      (100L, 1L, ts(10)), (101L, 1L, ts(30)), (102L, 1L, ts(5)),
      (200L, 2L, ts(50)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(10), "r@10"), (1L, ts(20), "r@20"), (3L, ts(1), "r-other"))
      .toDF("user_id", "ts", "tag")
    val got = AsOfJoin(left, right, "user_id", "ts", Seq("tag"))
      .select("event_id", "asof_tag").as[(Long, Option[String])]
      .collect().toMap
    // 100 @10 matches the equal-ts right row (inclusive as-of);
    // 101 @30 takes the latest earlier (r@20); 102 @5 precedes all
    // right rows; user 2 has none.
    assert(got == Map(
      100L -> Some("r@10"), 101L -> Some("r@20"),
      102L -> None, 200L -> None))
  }

  test("matched row is picked atomically: its NULL payloads stay NULL") {
    // The matched (latest at-or-before) right row at ts=20 has a NULL
    // note: that NULL must be RETURNED, not backfilled per-column
    // from the older row at ts=10 — a backfilled value would be
    // staler than what the tolerance predicate validates.
    val left = Seq((100L, 1L, ts(30))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(10), Some("old-note"), "q10"),
      (1L, ts(20), None: Option[String], "q20"))
      .toDF("user_id", "ts", "note", "quote")
    for (tol <- Seq(None, Some(60L * 60 * 1000000))) {
      val got = AsOfJoin(left, right, "user_id", "ts",
          Seq("note", "quote"), toleranceUs = tol)
        .select("event_id", "asof_note", "asof_quote")
        .as[(Long, Option[String], Option[String])].collect().toSeq
      assert(got == Seq((100L, None, Some("q20"))), s"tol=$tol: $got")
    }
  }

  test("nearest direction requires a timestamp-typed ts column") {
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, 5L, "r")).toDF("user_id", "ts", "tag")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin(left, right, "user_id", "ts", Seq("tag"),
        direction = "nearest")
    }
    assert(e.getMessage.contains("timestamp-typed"))
    // backward/forward stay orderable-typed: longs work.
    val ok = AsOfJoin(left, right, "user_id", "ts", Seq("tag"))
      .select("asof_tag").as[Option[String]].collect().toSeq
    assert(ok == Seq(Some("r")))
  }

  test("tolerance nulls stale matches, keeps every left row") {
    val left = Seq(
      (100L, 1L, ts(10)), (101L, 1L, ts(60)), (102L, 2L, ts(30)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(8), "r@8"), (1L, ts(20), "r@20"))
      .toDF("user_id", "ts", "tag")
    // 15-minute tolerance: 100 @10 matches r@8 (2 min old);
    // 101 @60's nearest match r@20 is 40 min stale -> NULL payload;
    // 102 has no right rows at all -> NULL. All three rows survive.
    val got = AsOfJoin(left, right, "user_id", "ts", Seq("tag"),
        toleranceUs = Some(15L * 60 * 1000000))
      .select("event_id", "asof_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(
      100L -> Some("r@8"), 101L -> None, 102L -> None))
    // Forward direction bounds the gap the other way.
    val fwd = AsOfJoin(left, right, "user_id", "ts", Seq("tag"),
        direction = "forward", toleranceUs = Some(15L * 60 * 1000000))
      .select("event_id", "asof_tag").as[(Long, Option[String])]
      .collect().toMap
    // 100 @10 -> next right r@20 (10 min ahead, in tolerance);
    // 101 @60 has nothing after it; 102 no right rows.
    assert(fwd == Map(
      100L -> Some("r@20"), 101L -> None, 102L -> None))
  }

  test("randomized: equals the brute-force latest-at-or-before match") {
    val rnd = new scala.util.Random(42L)
    for (round <- 1 to 6) {
      val nKeys = 1 + rnd.nextInt(6)
      val lefts = (1 to 1 + rnd.nextInt(60)).map(i =>
        (i.toLong, rnd.nextInt(nKeys + 2).toLong, // some keys right-less
          ts(rnd.nextInt(100).toLong)))
      // At most one right row per (key, ts): the operator's contract.
      val rights = (1 to 1 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(100).toLong)))
        .distinct.map { case (k, t) => (k, t, s"p$k@${t.getTime}") }

      val got = AsOfJoin(
        lefts.toDF("event_id", "user_id", "ts"),
        rights.toDF("user_id", "ts", "tag"),
        "user_id", "ts", Seq("tag"))
        .select("event_id", "asof_tag").as[(Long, Option[String])]
        .collect().toMap
      val want = lefts.map { case (id, k, t) =>
        val m = rights.filter(r => r._1 == k && !r._2.after(t))
        id -> (if (m.isEmpty) None else Some(m.maxBy(_._2.getTime)._3))
      }.toMap
      assert(got == want, s"round $round: nKeys=$nKeys")

      // The tolerance variant against the same brute force: the
      // unique match survives iff it is recent enough.
      val tolMin = 1L + rnd.nextInt(40)
      val gotTol = AsOfJoin(
        lefts.toDF("event_id", "user_id", "ts"),
        rights.toDF("user_id", "ts", "tag"),
        "user_id", "ts", Seq("tag"),
        toleranceUs = Some(tolMin * 60000000L))
        .select("event_id", "asof_tag").as[(Long, Option[String])]
        .collect().toMap
      val wantTol = lefts.map { case (id, k, t) =>
        val m = rights.filter(r => r._1 == k && !r._2.after(t))
        id -> (if (m.isEmpty) None else {
          val best = m.maxBy(_._2.getTime)
          if (t.getTime - best._2.getTime <= tolMin * 60000L)
            Some(best._3)
          else None
        })
      }.toMap
      assert(gotTol == wantTol, s"round $round tol=$tolMin min")
    }
  }

  test("forward: attaches the earliest at-or-after right row per key") {
    val left = Seq(
      (100L, 1L, ts(10)), (101L, 1L, ts(30)), (102L, 1L, ts(5)),
      (200L, 2L, ts(50)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(10), "r@10"), (1L, ts(20), "r@20"), (3L, ts(1), "r-other"))
      .toDF("user_id", "ts", "tag")
    val got = AsOfJoin(left, right, "user_id", "ts", Seq("tag"),
        direction = "forward")
      .select("event_id", "asof_tag").as[(Long, Option[String])]
      .collect().toMap
    // 100 @10 matches the equal-ts right row (inclusive); 101 @30 has
    // nothing after it; 102 @5 takes the earliest later (r@10).
    assert(got == Map(
      100L -> Some("r@10"), 101L -> None,
      102L -> Some("r@10"), 200L -> None))
  }

  test("nearest: picks the temporally closer side, ties to backward") {
    val left = Seq(
      (100L, 1L, ts(10)),  // r@8 is 2 back, r@20 is 10 ahead -> r@8
      (101L, 1L, ts(17)),  // r@20 is 3 ahead, r@8 is 9 back -> r@20
      (102L, 1L, ts(14)),  // equidistant (6 each) -> backward r@8
      (103L, 1L, ts(8)),   // equal ts -> gap 0 -> r@8
      (104L, 2L, ts(30)))  // no right rows
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(8), "r@8"), (1L, ts(20), "r@20"))
      .toDF("user_id", "ts", "tag")
    val got = AsOfJoin(left, right, "user_id", "ts", Seq("tag"),
        direction = "nearest")
      .select("event_id", "asof_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(100L -> Some("r@8"), 101L -> Some("r@20"),
      102L -> Some("r@8"), 103L -> Some("r@8"), 104L -> None))
    // With a tolerance the chosen match must also be close enough.
    val tol = AsOfJoin(left, right, "user_id", "ts", Seq("tag"),
        direction = "nearest", toleranceUs = Some(3L * 60 * 1000000))
      .select("event_id", "asof_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(tol == Map(100L -> Some("r@8"), 101L -> Some("r@20"),
      102L -> None, 103L -> Some("r@8"), 104L -> None))
  }

  test("randomized nearest: equals the brute-force closest match") {
    val rnd = new scala.util.Random(13L)
    for (round <- 1 to 6) {
      val nKeys = 1 + rnd.nextInt(6)
      val lefts = (1 to 1 + rnd.nextInt(60)).map(i =>
        (i.toLong, rnd.nextInt(nKeys + 2).toLong,
          ts(rnd.nextInt(100).toLong)))
      val rights = (1 to 1 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(100).toLong)))
        .distinct.map { case (k, t) => (k, t, s"p$k@${t.getTime}") }
      val got = AsOfJoin(
        lefts.toDF("event_id", "user_id", "ts"),
        rights.toDF("user_id", "ts", "tag"),
        "user_id", "ts", Seq("tag"), direction = "nearest")
        .select("event_id", "asof_tag").as[(Long, Option[String])]
        .collect().toMap
      val want = lefts.map { case (id, k, t) =>
        val m = rights.filter(_._1 == k)
        id -> (if (m.isEmpty) None else Some(
          // (|gap| ASC, at-or-before first) — pandas nearest ties.
          m.minBy(r => (math.abs(r._2.getTime - t.getTime),
            if (r._2.after(t)) 1 else 0))._3))
      }.toMap
      assert(got == want, s"round $round: nKeys=$nKeys")
    }
  }

  test("randomized forward: equals the brute-force earliest-at-or-after") {
    val rnd = new scala.util.Random(7L)
    for (round <- 1 to 6) {
      val nKeys = 1 + rnd.nextInt(6)
      val lefts = (1 to 1 + rnd.nextInt(60)).map(i =>
        (i.toLong, rnd.nextInt(nKeys + 2).toLong,
          ts(rnd.nextInt(100).toLong)))
      val rights = (1 to 1 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(100).toLong)))
        .distinct.map { case (k, t) => (k, t, s"p$k@${t.getTime}") }

      val got = AsOfJoin(
        lefts.toDF("event_id", "user_id", "ts"),
        rights.toDF("user_id", "ts", "tag"),
        "user_id", "ts", Seq("tag"), direction = "forward")
        .select("event_id", "asof_tag").as[(Long, Option[String])]
        .collect().toMap
      val want = lefts.map { case (id, k, t) =>
        val m = rights.filter(r => r._1 == k && !r._2.before(t))
        id -> (if (m.isEmpty) None else Some(m.minBy(_._2.getTime)._3))
      }.toMap
      assert(got == want, s"round $round: nKeys=$nKeys")
    }
  }

  test("left rows are never lost or duplicated") {
    val left = (1 to 50).map(i => (i.toLong, (i % 5).toLong, ts(i.toLong)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((0L, ts(0), 1L), (1L, ts(25), 2L))
      .toDF("user_id", "ts", "v")
    val out = AsOfJoin(left, right, "user_id", "ts", Seq("v"))
    assert(out.count() == 50)
    assert(out.select("event_id").distinct().count() == 50)
  }
}
