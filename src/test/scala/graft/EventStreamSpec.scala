package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Structured Streaming twins driven through MemoryStream: the same
  * aggregates as the batch block-C queries, arriving incrementally.
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, min: Long, user: Long, typ: String): Event =
    Event(id, new Timestamp(min * 60000L), user, typ, 1.0)

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
}
