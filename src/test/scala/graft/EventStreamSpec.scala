package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, FunnelState}

/** Structured Streaming twins driven through MemoryStream: the same
  * aggregates as the batch block-C queries, arriving incrementally.
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, min: Long, user: Long, typ: String): Event =
    Event(id, new Timestamp(min * 60000L), user, typ, 1.0)

  test("file job: session state survives across incremental runs") {
    import graft.sources.StreamSessionPipeline
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_ssess").toFile
      .getAbsolutePath
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    // Run 1: user 1 has an open 2-event session, user 2 a lone
    // event. Nothing can close yet — the job must emit NOTHING and
    // carry the open state in its checkpoint.
    Seq(ev(1, 10, 1, "click"), ev(2, 20, 1, "view"),
      ev(3, 5, 2, "click")).toDF()
      .write.mode("append").parquet(in)
    StreamSessionPipeline.run(spark, in, out, chk,
      watermark = "10 minutes")
    val schema = Seq.empty[EventStream.SessionOut].toDS().schema
    assert(spark.read.schema(schema).parquet(out).isEmpty,
      "no session can close before later data arrives")
    // Run 2: one new event 3 h later. The gap closes user 1's
    // carried session (emitted ONCE, by this run), and the advanced
    // watermark times out user 2's — both from state restored off
    // the checkpoint.
    Seq(ev(4, 200, 1, "click")).toDF()
      .write.mode("append").parquet(in)
    StreamSessionPipeline.run(spark, in, out, chk,
      watermark = "10 minutes")
    val got = spark.read.schema(schema).parquet(out)
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L)))
  }

  test("tumbling hourly counts match the batch aggregation") {
    val stream = MemoryStream[Event](spark)
    val q = EventStream.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_t")
      .outputMode("complete").start()
    try {
      stream.addData(
        ev(1, 10, 1, "click"), ev(2, 20, 1, "click"),
        ev(3, 70, 2, "view"), ev(4, 80, 1, "click"))
      q.processAllAvailable()
      val got = spark.table("tumbling_t")
        .select(col("hour_start").cast("long"), col("event_type"),
          col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      assert(got == Set((0L, "click", 2L), (3600L, "view", 1L),
        (3600L, "click", 1L)))
    } finally q.stop()
  }

  test("streaming funnel state tracks conversion incrementally") {
    val stream = MemoryStream[Event](spark)
    val q = EventStream.funnelState(spark, stream.toDS())
      .writeStream.format("memory").queryName("funnel_t")
      .outputMode("update").start()
    try {
      // user 1 signs up; user 2 purchases without signup.
      stream.addData(ev(1, 100, 1, "signup"), ev(2, 100, 2, "purchase"))
      q.processAllAvailable()
      // user 1 purchases after signup -> converted; user 2 stays not.
      stream.addData(ev(3, 150, 1, "purchase"))
      q.processAllAvailable()
      val last = spark.table("funnel_t")
        .groupBy("user_id").agg(max(struct(col("first_purchase"),
          col("converted"))).as("s"))
        .select(col("user_id"), col("s.converted"))
        .as[(Long, Boolean)].collect().toMap
      assert(last(1L) === true)
      assert(last(2L) === false)
    } finally q.stop()
  }

  test("streaming sessionize closes sessions on gap and emits them") {
    val stream = MemoryStream[Event](spark)
    val sessions = EventStream.sessionize(spark, stream.toDS())
    val q = sessions.writeStream.format("memory").queryName("sessions_t")
      .outputMode("append").start()
    try {
      // user 1: events at 100 and 110 min (one session), then 220 min
      // — the >30-min gap closes the first session inline. (Times sit
      // well above epoch 0: an event AT the initial watermark value
      // would be dropped as late.)
      stream.addData(ev(1, 100, 1, "click"), ev(2, 110, 1, "click"))
      q.processAllAvailable()
      stream.addData(ev(3, 220, 1, "click"))
      q.processAllAvailable()
      val got = spark.table("sessions_t")
        .select(col("user_id"), col("session_start").cast("long"),
          col("session_end").cast("long"), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 6000L, 6600L, 2L)))
    } finally q.stop()
  }

  /** Shared multi-user, multi-session event set for the parity tests:
    * user 1 has two sessions (gap > 30 min), user 2 two, user 3 one;
    * event types exercise every funnel path (convert, purchase-only,
    * purchase-before-signup).
    */
  private val parityEvents: Seq[Event] = Seq(
    Event(1, new Timestamp(100 * 60000L), 1, "signup", 1.0),
    Event(2, new Timestamp(105 * 60000L), 2, "purchase", 0.5),
    Event(3, new Timestamp(90 * 60000L), 3, "click", 2.0),
    Event(4, new Timestamp(110 * 60000L), 1, "click", 1.5),
    Event(5, new Timestamp(118 * 60000L), 3, "view", 0.25),
    Event(6, new Timestamp(125 * 60000L), 1, "purchase", 4.0),
    Event(7, new Timestamp(145 * 60000L), 3, "click", 1.0),
    Event(8, new Timestamp(200 * 60000L), 2, "signup", 0.75),
    Event(9, new Timestamp(215 * 60000L), 2, "view", 2.5),
    Event(10, new Timestamp(220 * 60000L), 1, "click", 3.0))

  private def feedInTwoBatches(stream: MemoryStream[Event],
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val (early, late) = parityEvents.partition(_.ts.getTime <= 130 * 60000L)
    stream.addData(early: _*)
    q.processAllAvailable()
    stream.addData(late: _*)
    q.processAllAvailable()
  }

  test("parity: streamed Markov steps equal the batch q51 transition counts") {
    val b1 = Seq(ev(1, 10, 1, "view"), ev(2, 20, 1, "click"),
      ev(3, 15, 2, "view"), ev(4, 30, 2, "view"),
      ev(5, 12, 3, "signup"))
    val b2 = Seq(ev(6, 40, 1, "purchase"), ev(7, 45, 2, "click"),
      ev(8, 50, 3, "view"), ev(9, 55, 3, "click"))
    val stream = MemoryStream[Event](spark)
    val q = EventStream.transitions(spark, stream.toDS())
      .writeStream.format("memory").queryName("trans_t")
      .outputMode("append").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      // q51's rollup applied unchanged to the emitted step stream
      val streamed = spark.table("trans_t")
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n_steps"))
        .as[(String, String, Long)].collect().toSet
      // batch reference: the q51 window over the union
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val batch = (b1 ++ b2).toDF()
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n_steps"))
        .as[(String, String, Long)].collect().toSet
      assert(streamed == batch)
      // the cross-batch chain exists: user 1 click->purchase spans
      // the two micro-batches
      assert(streamed.exists(t => t._1 == "click" && t._2 == "purchase"))
    } finally q.stop()
  }

  test("parity: streaming sessionize equals batch operators.Sessionize") {
    val stream = MemoryStream[Event](spark)
    val q = EventStream.sessionize(spark, stream.toDS())
      .writeStream.format("memory").queryName("sess_parity_t")
      .outputMode("append").start()
    try {
      feedInTwoBatches(stream, q)
      // Two sentinel batches on a dummy user: the first advances the
      // global watermark past every session's end+gap (the watermark
      // computed in batch N applies in batch N+1), the second gives
      // the event-time timeout a batch to fire in — flushing every
      // still-open session so the streamed set is complete.
      stream.addData(Event(98, new Timestamp(2000 * 60000L), 99, "flush", 0.0))
      q.processAllAvailable()
      stream.addData(Event(99, new Timestamp(2100 * 60000L), 99, "flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_parity_t")
        .filter(col("user_id") =!= 99L)
        .select(col("user_id"), col("session_start").cast("long"),
          col("session_end").cast("long"), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = Sessionize(parityEvents.toDF(), "user_id", "ts",
          gapMicros = 1800L * 1000000L)
        .groupBy("user_id", "session_id")
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_start").cast("long"),
          col("session_end").cast("long"), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("parity: streaming tumbling counts equal the batch q20 plan") {
    val stream = MemoryStream[Event](spark)
    val q = EventStream.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_parity_t")
      .outputMode("complete").start()
    try {
      feedInTwoBatches(stream, q)
      val streamed = spark.table("tumbling_parity_t")
        .select(col("hour_start").cast("long"), col("event_type"),
          col("n_events"), col("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      // The batch q20 grouping expression, applied to the same rows.
      val batch = parityEvents.toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
        .select(col("window.start").cast("long"), col("event_type"),
          col("n_events"), col("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("parity: sliding windows — ONE definition, overlap counted in both") {
    val stream = MemoryStream[Event](spark)
    val q = EventStream.slidingCounts(stream.toDF())
      .writeStream.format("memory").queryName("sliding_parity_t")
      .outputMode("complete").start()
    try {
      feedInTwoBatches(stream, q)
      val streamed = spark.table("sliding_parity_t")
        .select(col("win_start").cast("long"), col("event_type"),
          col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      val batch = EventStream.slidingCounts(parityEvents.toDF())
        .select(col("win_start").cast("long"), col("event_type"),
          col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      assert(streamed == batch)
      // 2h window / 1h slide: every event must appear in exactly two
      // windows, so total window-membership = 2 × events per type.
      val perType = parityEvents.groupBy(_.event_type).view
        .mapValues(_.size * 2L).toMap
      assert(batch.toSeq.groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toMap == perType)
    } finally q.stop()
  }

  test("parity: jsonTypeCounts — ONE definition serves batch and complete-mode stream") {
    val rows = Seq(("click", """{"k":3}"""), ("click", """{"k":5}"""),
      ("view", """{"k":1}"""), ("view", null), ("buy", """{"nope":1}"""))
    val stream = MemoryStream[(String, String)](spark)
    val q = EventStream.jsonTypeCounts(
        stream.toDF().toDF("event_type", "props"))
      .writeStream.format("memory").queryName("json_parity_t")
      .outputMode("complete").start()
    try {
      stream.addData(rows.take(2): _*)
      q.processAllAvailable()
      stream.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("json_parity_t")
        .as[(String, Long, Option[Long])].collect().toSet
      val batch = EventStream.jsonTypeCounts(rows.toDF("event_type", "props"))
        .as[(String, Long, Option[Long])].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("parity: watermarked stream-stream join equals the batch interval join") {
    val clicks = Seq(ev(1, 100, 1, "click"), ev(2, 130, 1, "click"),
      ev(3, 100, 2, "click"))
    val purchases = Seq(ev(10, 120, 1, "purchase"),   // 20 min after c1
      ev(11, 200, 1, "purchase"),                     // 70 min after c2: out
      ev(12, 155, 2, "purchase"))                     // 55 min after c3
    val cStream = MemoryStream[Event](spark)
    val pStream = MemoryStream[Event](spark)
    val q = EventStream.clickPurchaseJoin(cStream.toDF(), pStream.toDF())
      .writeStream.format("memory").queryName("ssjoin_parity_t")
      .outputMode("append").start()
    try {
      cStream.addData(clicks.take(2): _*)
      pStream.addData(purchases.take(1): _*)
      q.processAllAvailable()
      cStream.addData(clicks.drop(2): _*)
      pStream.addData(purchases.drop(1): _*)
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_parity_t")
        .select("user_id", "click_id", "purchase_id")
        .as[(Long, Long, Long)].collect().toSet
      val batch = EventStream.clickPurchaseJoin(
          clicks.toDF(), purchases.toDF())
        .select("user_id", "click_id", "purchase_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      // c2@130 → p11@200 is 70 min out-of-window; everything in-window
      // joins (c1→p10 at 20 min, c1@100→nothing else for user 1 in
      // range except p10; c3→p12 at 55 min).
      assert(batch == Set((1L, 1L, 10L), (2L, 3L, 12L)))
    } finally q.stop()
  }

  test("parity: streaming funnel final state equals the batch q19 per-user aggregate") {
    val lastState = scala.collection.concurrent.TrieMap
      .empty[Long, (Long, Long, Boolean)]
    val stream = MemoryStream[Event](spark)
    val q = EventStream.funnelState(spark, stream.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[FunnelState], _: Long) =>
        // A user's last emission IS their final state: state only
        // changes in batches containing that user's events.
        df.collect().foreach(s =>
          lastState(s.user_id) = (s.first_signup, s.first_purchase, s.converted))
      }.start()
    try {
      feedInTwoBatches(stream, q)
      val batch = parityEvents.toDF()
        .groupBy("user_id")
        .agg(
          coalesce(min(when(col("event_type") === "signup",
            unix_micros(col("ts")))), lit(0L)).as("fs"),
          coalesce(min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))), lit(0L)).as("fp"))
        .select(col("user_id"), col("fs"), col("fp"),
          (col("fs") > 0L && col("fp") >= col("fs") && col("fp") > 0L)
            .as("converted"))
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(lastState.toMap == batch)
    } finally q.stop()
  }

  test("parity: streaming windowDedup equals the batch q48 aggregate") {
    // Duplicated (user, type) keys inside one hour — including a
    // duplicate that ARRIVES in the second micro-batch (id 23 joins
    // key (1, click, hour1) opened by id 20 in batch one) — plus a
    // same-key event in a different hour that must NOT collapse.
    // value = id/10 so the min_by payload pick is observable.
    def dv(id: Long, min: Long, user: Long, typ: String): Event =
      Event(id, new Timestamp(min * 60000L), user, typ, id / 10.0)
    val dups = Seq(
      dv(20, 100, 1, "click"), dv(21, 110, 1, "click"),
      dv(22, 105, 2, "view"),
      dv(23, 115, 1, "click"),                   // late dup, batch 2
      dv(24, 130, 1, "click"),                   // next hour: kept
      dv(25, 140, 2, "view"), dv(26, 150, 2, "view"))
    val stream = MemoryStream[Event](spark)
    val q = EventStream.windowDedup(stream.toDF())
      .writeStream.format("memory").queryName("dedup_parity_t")
      .outputMode("complete").start()
    try {
      stream.addData(dups.take(3): _*)
      q.processAllAvailable()
      stream.addData(dups.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("dedup_parity_t")
        .select(col("hour_start").cast("long"), col("user_id"),
          col("event_type"), col("kept_event_id"), col("kept_value"),
          col("n_dups"))
        .as[(Long, Long, String, Long, Double, Long)].collect().toSet
      val batch = EventStream.windowDedup(dups.toDF())
        .select(col("hour_start").cast("long"), col("user_id"),
          col("event_type"), col("kept_event_id"), col("kept_value"),
          col("n_dups"))
        .as[(Long, Long, String, Long, Double, Long)].collect().toSet
      assert(streamed == batch)
      // The hour-1 click run (20, 21, 23) keeps 20 with 3 collapsed;
      // 24 opens hour 2 alone; the view run (22, 25, 26) spans hours.
      val clicks1 = batch.filter(r => r._2 == 1L && r._3 == "click")
      assert(clicks1.map(r => (r._4, r._5, r._6)) ==
        Set((20L, 2.0, 3L), (24L, 2.4, 1L)))
    } finally q.stop()
  }

  test("parity: streaming as-of join equals the batch q21 chain, incl. cross-batch") {
    // user 1: click then purchase in DIFFERENT micro-batches (the
    // cross-batch match); a fresher click then a second purchase.
    // user 2: purchase with NO prior click (drops, batch isNotNull
    // semantics); then two same-ts clicks (max event_id wins — the
    // q21 pre-aggregation) before a purchase.
    // user 3: click and purchase at the SAME timestamp (inclusive
    // as-of: matches).
    val b1 = Seq(ev(1, 10, 1, "click"), ev(2, 5, 2, "purchase"),
      ev(3, 20, 2, "click"), ev(4, 20, 2, "click"),
      ev(5, 30, 3, "click"))
    val b2 = Seq(ev(6, 40, 1, "purchase"), ev(7, 50, 1, "click"),
      ev(8, 60, 1, "purchase"), ev(9, 35, 2, "purchase"),
      ev(10, 30, 3, "purchase"))
    val stream = MemoryStream[Event](spark)
    val q = EventStream.asofLastClick(spark, stream.toDS())
      .writeStream.format("memory").queryName("asof_t")
      .outputMode("append").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("asof_t")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      // Batch reference: the exact q21 chain over the union.
      val evs = (b1 ++ b2).toDF()
      val clicks = evs.filter(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("click_id"))
        .select(col("user_id"), col("ts"), col("click_id"),
          unix_micros(col("ts")).as("click_ts_us"))
      val purchases = evs.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val batch = graft.operators.AsOfJoin(purchases, clicks,
          "user_id", "ts", Seq("click_id", "click_ts_us"))
        .filter(col("asof_click_id").isNotNull)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("asof_click_id"), col("asof_click_ts_us"),
          (unix_micros(col("ts")) - col("asof_click_ts_us")).as("gap"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      // Load-bearing cases all present: the cross-batch match (6
      // matched click 1), the same-ts max-id pre-agg (9 matched
      // click 4, not 3), the inclusive same-ts match (10 matched 5),
      // and the no-prior-click drop (2 absent).
      assert(streamed.exists(r => r._1 == 6L && r._4 == 1L))
      assert(streamed.exists(r => r._1 == 9L && r._4 == 4L))
      assert(streamed.exists(r => r._1 == 10L && r._4 == 5L && r._6 == 0L))
      assert(!streamed.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("as-of state evicts on the event-time horizon") {
    val stream = MemoryStream[Event](spark)
    // Tight horizon: a stored click expires 30 min (event time)
    // after it happened; watermark delay 10 min.
    val q = EventStream.asofLastClick(spark, stream.toDS(),
        idleGapMicros = 30L * 60000L * 1000L, watermark = "10 minutes")
      .writeStream.format("memory").queryName("asof_evict_t")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 10, 1, "click"))
      q.processAllAvailable()
      // Advance the watermark far past click+gap via another user,
      // then give the timeout a batch to fire in (watermark from
      // batch N applies in N+1).
      stream.addData(ev(2, 300, 99, "view"))
      q.processAllAvailable()
      stream.addData(ev(3, 310, 99, "view"))
      q.processAllAvailable()
      // The purchase arrives after the stored click was reclaimed:
      // no match emitted.
      stream.addData(ev(4, 320, 1, "purchase"))
      q.processAllAvailable()
      assert(spark.table("asof_evict_t").isEmpty)
      // A fresh click re-arms the state and the next purchase matches.
      stream.addData(ev(5, 330, 1, "click"), ev(6, 340, 1, "purchase"))
      q.processAllAvailable()
      val got = spark.table("asof_evict_t")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == Seq((6L, 1L, 340 * 60000000L, 5L,
        330 * 60000000L, 10 * 60000000L)))
    } finally q.stop()
  }

  test("parity: streaming SCD-2 closed versions equal the batch q57 non-current rows") {
    // user 1's state changes SPAN the micro-batch boundary (the
    // version opened by event 3 in batch 1 closes via event 5 in
    // batch 2); user 2 folds consecutive same-type events into one
    // version; user 3 never changes (one open version, nothing
    // closed, nothing emitted).
    val b1 = Seq(ev(1, 10, 1, "view"), ev(2, 20, 1, "view"),
      ev(3, 30, 1, "click"), ev(4, 10, 2, "signup"),
      ev(7, 15, 3, "view"))
    val b2 = Seq(ev(5, 40, 1, "purchase"), ev(6, 50, 2, "signup"),
      ev(8, 60, 2, "error"), ev(9, 70, 3, "view"))
    val stream = MemoryStream[Event](spark)
    val q = EventStream.scd2(spark, stream.toDS())
      .writeStream.format("memory").queryName("scd2_t")
      .outputMode("append").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("scd2_t")
        .as[(Long, Long, String, Long, Long)].collect().toSet
      // Batch reference: the q57 chain, keeping only CLOSED versions.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("tsl"), col("event_id"))
      val batch = (b1 ++ b2).toDF()
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tsl"), col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
        .withColumn("valid_to", lead("tsl", 1).over(w))
        .withColumn("version", row_number().over(w).cast("long"))
        .filter(col("valid_to").isNotNull)
        .select(col("user_id"), col("version"),
          col("event_type"), col("tsl"), col("valid_to"))
        .as[(Long, Long, String, Long, Long)].collect().toSet
      assert(streamed == batch)
      // Cross-batch close happened: user 1's click version (opened
      // batch 1) closed at event 5's ts (batch 2).
      assert(streamed.contains(
        (1L, 2L, "click", 30 * 60000000L, 40 * 60000000L)))
      // Same-type folding: user 2's two signups are ONE version.
      assert(streamed.count(r => r._1 == 2L && r._3 == "signup") == 1)
      // Never-changed user emits nothing.
      assert(!streamed.exists(_._1 == 3L))
      // Late-data guard: a straggler OLDER than the user's high-water
      // mark is dropped — no inverted interval, no version churn.
      stream.addData(ev(10, 35, 1, "error"))
      q.processAllAvailable()
      val after = spark.table("scd2_t")
        .as[(Long, Long, String, Long, Long)].collect().toSet
      assert(after == streamed,
        "a late straggler must not close or open any version")
      // An in-order successor still closes the open purchase version.
      stream.addData(ev(11, 80, 1, "view"))
      q.processAllAvailable()
      val closed = spark.table("scd2_t")
        .as[(Long, Long, String, Long, Long)].collect().toSet
      assert(closed.contains(
        (1L, 3L, "purchase", 40 * 60000000L, 80 * 60000000L)))
    } finally q.stop()
  }

  test("parity: streaming scd2AsOf time-travel read equals the batch q61 plan") {
    // As-of point t = minute 35. user 1's covering version (click,
    // opened batch 1) CLOSES in batch 2 — the cross-batch close must
    // emit immediately; user 2's covering version never closes —
    // served by the event-time timeout once the watermark passes t;
    // user 3 first appears after t (no as-of row); user 4's covering
    // version is its SECOND (the first closed before t).
    val asofUs = 35 * 60000000L
    // user 5 is NEVER QUIET: it sends a same-type event in every
    // batch including the sentinel ones, so its group always has
    // data and the event-time timeout can never fire for it — the
    // DATA branch must serve its read once the watermark passes t
    // (the review-caught liveness hole).
    val b1 = Seq(ev(1, 10, 1, "view"), ev(2, 30, 1, "click"),
      ev(3, 10, 2, "signup"), ev(6, 5, 4, "view"),
      ev(7, 20, 4, "error"), ev(20, 12, 5, "view"))
    val b2 = Seq(ev(4, 40, 1, "purchase"), ev(5, 50, 2, "signup"),
      ev(8, 40, 3, "view"), ev(21, 45, 5, "view"))
    val stream = MemoryStream[Event](spark)
    val q = EventStream.scd2AsOf(spark, stream.toDS(), asofUs,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("asof_read_t")
      .outputMode("append").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      // Cross-batch close already served user 1, before any timeout.
      val early = spark.table("asof_read_t")
        .as[(Long, Long, String, Long, Long)].collect().toSet
      assert(early.contains((1L, 2L, "click", 30 * 60000000L, asofUs)),
        s"cross-batch close must serve the read immediately: $early")
      // Advance the watermark past t via a sentinel user, then give
      // the timeouts a batch to fire in (batch N's watermark applies
      // in N+1).
      stream.addData(ev(90, 300, 99, "view"), ev(22, 305, 5, "view"))
      q.processAllAvailable()
      stream.addData(ev(91, 310, 99, "view"), ev(23, 315, 5, "view"))
      q.processAllAvailable()
      // Keep user 5 active one more batch: its row must have come
      // from the data branch, not a timeout, and must not repeat.
      stream.addData(ev(24, 320, 5, "view"))
      q.processAllAvailable()
      val streamed = spark.table("asof_read_t")
        .as[(Long, Long, String, Long, Long)].collect()
      assert(streamed.length == streamed.toSet.size,
        "the as-of row must emit exactly once per user")
      assert(streamed.toSet.contains(
        (5L, 1L, "view", 12 * 60000000L, asofUs)),
        s"never-quiet user must be served by the data branch: " +
          s"${streamed.toSet}")
      // Batch reference: q61's exact plan over the same events with
      // the same fixed t (sentinel included — it must NOT produce a
      // row: its valid_from is past t).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("tsl"), col("event_id"))
      val batch = (b1 ++ b2 ++ Seq(ev(90, 300, 99, "view"),
          ev(22, 305, 5, "view"), ev(91, 310, 99, "view"),
          ev(23, 315, 5, "view"), ev(24, 320, 5, "view"))).toDF()
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tsl"), col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
        .withColumn("valid_to", lead("tsl", 1).over(w))
        .withColumn("version", row_number().over(w).cast("long"))
        .filter(col("tsl") <= asofUs &&
          (col("valid_to").isNull || col("valid_to") > asofUs))
        .select(col("user_id"), col("version"), col("event_type"),
          col("tsl"), lit(asofUs).as("asof_ts"))
        .as[(Long, Long, String, Long, Long)].collect().toSet
      assert(streamed.toSet == batch,
        s"streamed=${streamed.toSet} batch=$batch")
      assert(batch.map(_._1) == Set(1L, 2L, 4L, 5L))
    } finally q.stop()
  }

  test("parity: streaming windowed KLL quantiles equal batch and exact ranks") {
    // Two hourly windows; window 1's events SPAN the micro-batch
    // boundary, so the sketch state genuinely MERGES partials across
    // batches (the mergeable-aggregate contract under streaming).
    // Values are i cents → exact expected order statistics.
    def e2(id: Long, min: Long, v: Double) =
      Event(id, new Timestamp(min * 60000L), 1L, "view", v)
    val w1 = (1 to 7).map(i => e2(i, 5 + i, i / 100.0))      // 0.01..0.07
    val w2 = (1 to 9).map(i => e2(100 + i, 65 + i, i / 10.0)) // 0.1..0.9
    val (b1, b2) = (w1.take(3) ++ w2.take(4), w1.drop(3) ++ w2.drop(4))
    val stream = MemoryStream[Event](spark)
    val q = EventStream.windowQuantiles(stream.toDS().toDF())
      .writeStream.format("memory").queryName("kllq_t")
      .outputMode("complete").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("kllq_t")
        .select(col("n"), col("p50_c"), col("p90_c"))
        .as[(Long, Long, Long)].collect().toSet
      // Exact: w1 has n=7, p50 = 4th smallest = 4c, p90 = ceil(6.3)=7th = 7c;
      // w2 has n=9, p50 = ceil(4.5)=5th = 50c, p90 = ceil(8.1)=9th = 90c.
      assert(got == Set((7L, 4L, 7L), (9L, 50L, 90L)))
      // ONE definition serves batch: same call on the static frame.
      val batch = EventStream.windowQuantiles((b1 ++ b2).toDF())
        .select(col("n"), col("p50_c"), col("p90_c"))
        .as[(Long, Long, Long)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("parity: streaming CDC-apply latest rows equal the batch q60 merge") {
    import graft.streaming.EventStream.{CdcChange, CdcOut}
    // Key 1: update in batch 1, deleted in batch 2 (cross-batch D
    // wins). Key 2: delete then a LATER update in batch 2 (U wins).
    // Key 3: batch-2 change carries an EARLIER sequence than the
    // batch-1 one — replayed/out-of-order CDC must NOT regress the
    // view. Key 4: insert only.
    val b1 = Seq(
      CdcChange(1L, 10L, 1L, "U", 11L, "a1"),
      CdcChange(2L, 10L, 2L, "D", 0L, "x"),
      CdcChange(3L, 50L, 3L, "U", 33L, "c2"),
      CdcChange(4L, 10L, 4L, "I", 40L, "d"))
    val b2 = Seq(
      CdcChange(1L, 20L, 5L, "D", 0L, "x"),
      CdcChange(2L, 20L, 6L, "U", 22L, "b2"),
      CdcChange(3L, 20L, 7L, "U", 31L, "c1")) // stale: seq < (50, 3)
    val stream = MemoryStream[CdcChange](spark)
    val q = EventStream.cdcApply(spark, stream.toDS())
      .writeStream.format("memory").queryName("cdc_t")
      .outputMode("update").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      val rows = spark.table("cdc_t").as[CdcOut].collect()
      // Latest emitted row per key (max sequence) is the view.
      val view = rows.groupBy(_.key).map { case (k, rs) =>
        k -> rs.maxBy(r => (r.tsl, r.event_id))
      }
      // Batch reference: q60's Merge over an empty base.
      val base = Seq.empty[(Long, Long, String)].toDF("key", "bal_c", "seg")
      val merged = graft.operators.Merge.applyChangelog(base,
          (b1 ++ b2).toDF(), keyCol = "key",
          seqCols = Seq(col("tsl"), col("event_id")), opCol = "op",
          valueCols = Seq("bal_c", "seg"))
        .as[(Long, Long, String)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      // Upserted keys agree on values; deleted keys are tombstones.
      assert(view(2L).op == "U" && merged(2L) == ((22L, "b2")))
      assert(view(3L).op == "U" && view(3L).bal_c == 33L &&
        merged(3L) == ((33L, "c2")), "stale batch-2 row must not win")
      assert(view(4L).op == "I" && merged(4L) == ((40L, "d")))
      assert(view(1L).op == "D" && !merged.contains(1L))
      assert(merged.keySet == view.filter(_._2.op != "D").keySet)
    } finally q.stop()
  }
}
