package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event-analytics surface
  * (SURVEY.md §2 block C): the same aggregations, expressed over an
  * unbounded source with event-time watermarks.
  *
  * Batch/stream parity is by construction: [[tumblingCounts]] uses
  * the identical `window()` grouping expression the batch
  * q20_tumbling_window plan uses, and [[sessionize]] implements the
  * same 30-minute-gap semantics as graft.operators.Sessionize, with
  * state that expires via event-time timeout (bounded memory on an
  * unbounded stream — the 100 TB/day posture).
  */
object EventStream {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Timestamp → epoch micros, shared by every stateful twin (the
    * getTime millis already include the first three nano digits, so
    * only the sub-milli remainder is added back).
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Open-session state (public: Spark's state encoder codegen needs
    * constructor access).
    */
  case class SessionState(start: Long, end: Long, n: Long)

  /** Per-user funnel progress (streaming twin of the batch
    * q19_funnel aggregate): earliest signup / earliest
    * at-or-after-signup purchase, in epoch micros (0 = none yet).
    */
  case class FunnelState(user_id: Long, first_signup: Long,
      first_purchase: Long, converted: Boolean)

  /** Hourly tumbling event counts with a watermark: late data beyond
    * `watermark` is dropped and window state is reclaimed.
    */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming WINDOWED QUANTILES through the mergeable KLL sketch
    * (d76's functions.KllSketch as a streaming aggregate — the
    * mergeable contract is exactly what streaming aggregation
    * needs: partials build map-side per micro-batch and MERGE into
    * the windowed state, bounded O(cap·log n) per open window,
    * reclaimed past the watermark): per tumbling hour, event-value
    * cent quantiles (p50/p90) by the same integer cum-weight rank
    * rule as d76. ONE definition serves batch and stream
    * (withWatermark is a no-op on a static frame — the parity spec
    * runs the IDENTICAL call both ways).
    */
  def windowQuantiles(events: DataFrame, watermark: String = "2 hours")
      : DataFrame = {
    import graft.functions.KllSketch.kll_sketch
    def rank(num: Int, den: Int) = expr(
      // smallest v with cumweight·den ≥ n·num — the d76 rule, as a
      // fold over the (v, w)-sorted sketch: carry (remaining rank
      // target · den−scaled, answer).
      s"""aggregate(sk, named_struct('cw', 0L, 'v', CAST(NULL AS BIGINT)),
         |  (acc, x) -> IF(acc.v IS NOT NULL, acc,
         |    IF((acc.cw + x.w) * $den >= n * $num,
         |      named_struct('cw', acc.cw + x.w, 'v', x.v),
         |      named_struct('cw', acc.cw + x.w,
         |        'v', CAST(NULL AS BIGINT)))),
         |  acc -> acc.v)""".stripMargin)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(kll_sketch(floor(col("value") * 100 + 0.5).cast("long"),
        4096).as("sk"))
      .withColumn("n",
        aggregate(col("sk"), lit(0L), (a, x) => a + x.getField("w")))
      .select(col("window.start").as("hour_start"), col("n"),
        rank(1, 2).as("p50_c"), rank(9, 10).as("p90_c"))
  }

  /** SLIDING-window event counts (the q35 moving-average shape in
    * its streaming form): `windowLen` windows advancing every
    * `slide`, so each event lands in windowLen/slide overlapping
    * windows — `window()` expands it map-side, the aggregation state
    * is per (window, type) and reclaimed past the watermark. ONE
    * definition serves batch and stream (`withWatermark` is a no-op
    * on a static frame).
    */
  def slidingCounts(events: DataFrame, windowLen: String = "2 hours",
      slide: String = "1 hour", watermark: String = "2 hours")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** Idempotent-ingestion dedup: collapse repeated (user, type)
    * events within each hourly window to the FIRST row (min
    * event_id), carrying its payload via `min_by` and counting how
    * many duplicates collapsed. ONE definition serves batch and
    * stream: on a static frame the watermark is a no-op and this is
    * a plain hash aggregation; on a stream the state is one row per
    * open (window, user, type) key, emitted in append mode and
    * reclaimed once the watermark passes the window end — the
    * at-least-once → exactly-once repair step at the front of an
    * ingestion pipeline. Map-side partial aggregation absorbs the
    * duplicate rows before the one exchange.
    */
  def windowDedup(events: DataFrame, watermark: String = "2 hours")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"),
        col("event_type"))
      .agg(min("event_id").as("kept_event_id"),
        min_by(col("value"), col("event_id")).as("kept_value"),
        count(lit(1)).as("n_dups"))
      .select(col("window.start").as("hour_start"), col("user_id"),
        col("event_type"), col("kept_event_id"), col("kept_value"),
        col("n_dups"))

  /** JSON-property extraction + per-type aggregate (the q17 shape).
    * ONE definition serves batch and stream: applied to a static
    * DataFrame it is the batch aggregate; applied to a streaming
    * DataFrame it runs in complete output mode (global aggregation,
    * state = one row per event type — bounded). This is the
    * batch/stream parity claim in its strongest form — not twin
    * plans, the same plan.
    */
  def jsonTypeCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"))

  /** Watermarked stream-stream inner join: purchases within one hour
    * after a click by the same user (interval attribution, both
    * sides unbounded). The time-bound condition plus both watermarks
    * is what makes this runnable forever: Spark derives how long a
    * click must be buffered (1 hour of purchases) and how late a
    * purchase may arrive, then evicts state past the watermark.
    * Without the time bounds the join state would grow without
    * limit.
    *
    * Applied to static frames the same function is the batch interval
    * join (watermarks are no-ops in batch) — used by the parity test.
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame)
      : DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 1 hour"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Streaming funnel tracking via mapGroupsWithState (update mode):
    * one output row per user per batch with their current funnel
    * state. State is two timestamps per user — O(users), unbounded
    * stream safe. A user converts when their earliest purchase is
    * at-or-after their earliest signup (batch q19 semantics).
    */
  def funnelState(spark: SparkSession, events: Dataset[Event])
      : Dataset[FunnelState] = {
    import spark.implicits._

    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelState](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var s = state.getOption
            .getOrElse(FunnelState(userId, 0L, 0L, converted = false))
          for (e <- rows) {
            val t = micros(e.ts)
            e.event_type match {
              case "signup" if s.first_signup == 0L || t < s.first_signup =>
                s = s.copy(first_signup = t)
              case "purchase" if s.first_purchase == 0L || t < s.first_purchase =>
                s = s.copy(first_purchase = t)
              case _ =>
            }
          }
          s = s.copy(converted = s.first_signup > 0L &&
            s.first_purchase >= s.first_signup)
          state.update(s)
          s
      }
  }

  /** Last-event-per-user state for [[transitions]] (epoch micros +
    * the tiebreak id, so cross-batch chaining orders exactly like
    * the batch q51 window).
    */
  case class TransState(last_ts: Long, last_event_id: Long,
      last_type: String)

  /** One emitted Markov step. */
  case class TransitionOut(user_id: Long, from_type: String,
      to_type: String)

  /** Streaming first-order transition extraction — the q51 twin's
    * stateful half: per-user state is ONE row (the last event seen),
    * and each arriving event emits its (from → to) step exactly
    * once, chaining across micro-batches. Within a batch rows order
    * by (ts, event_id) — the batch window's exact sort; across
    * batches the stream is assumed per-user in-order (the log-ingest
    * contract; a violation inverts only the affected step). Counting
    * and probabilities stay downstream — q51's batch rollup applies
    * unchanged to the emitted step stream.
    *
    * State is O(ACTIVE users), not all-users-ever: a user idle past
    * `idleGapMicros` (by event time, watermark-driven — the sessionize
    * expiry discipline) has their last-event row reclaimed; a later
    * event from them starts a fresh chain, dropping only the one
    * step that would have spanned the gap — the same bounded-state
    * trade every watermark operator here makes.
    */
  def transitions(spark: SparkSession, events: Dataset[Event],
      idleGapMicros: Long = 24L * 3600 * 1000000,
      watermark: String = "1 hour"): Dataset[TransitionOut] = {
    import spark.implicits._

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransitionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var last = state.getOption
            val out = Seq.newBuilder[TransitionOut]
            for (e <- sorted) {
              last.foreach(l =>
                out += TransitionOut(userId, l.last_type, e.event_type))
              last = Some(TransState(micros(e.ts), e.event_id,
                e.event_type))
            }
            last.foreach { l =>
              state.update(l)
              // Spark rejects timeouts at or below the current
              // watermark (query-killing IllegalArgumentException), so
              // clamp: an event older than watermark+gap still gets a
              // valid just-past-the-watermark expiry.
              state.setTimeoutTimestamp(
                math.max((l.last_ts + idleGapMicros) / 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Streaming 30-min-gap sessionization via flatMapGroupsWithState:
    * per-user state holds the open session; an event past the gap (or
    * the event-time timeout firing once the watermark passes
    * start+gap) closes and emits it. State is O(active users), not
    * O(events) — the property that keeps this runnable forever.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMicros: Long = 1800L * 1000000L,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    import spark.implicits._

    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, toTs(s.start), toTs(s.end), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            for (e <- sorted) {
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.end <= gapMicros =>
                  cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, toTs(s.start), toTs(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Expire once the watermark passes the gap after the
              // session's last event; clamped above the current
              // watermark because Spark rejects timeouts at or below
              // it (would kill the query, not just drop a step).
              state.setTimeoutTimestamp(
                math.max((s.end + gapMicros) / 1000 + 1,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** The OPEN SCD-2 version per user (the one-row state of the
    * streaming dimension build) plus the event-time high-water mark
    * used to drop late arrivals. Public for Spark's state encoder
    * codegen.
    */
  case class Scd2State(version: Long, state_type: String,
      valid_from_us: Long, last_ts_us: Long)

  case class Scd2Out(user_id: Long, version: Long, state: String,
      valid_from: Long, valid_to: Long)

  /** Streaming twin of q57's SCD-2 dimension build: per-user state
    * is the OPEN version (type + valid_from + version counter); an
    * event whose type DIFFERS from the open version closes it —
    * emitting the finished validity interval exactly once — and
    * opens the next; same-type events fold in silently (q57's
    * change-only semantics). Append mode emits CLOSED versions only:
    * the open row is not final until its successor arrives, so on
    * IN-ORDER delivery the streamed output equals the batch q57
    * rows with `is_current = false` (EventStreamSpec pins it, incl.
    * a cross-microbatch close).
    *
    * Late data: an event older than the user's event-time high-water
    * mark is DROPPED (one per-user scalar in state) — without the
    * guard a straggler would close the open version with
    * `valid_to < valid_from` and permanently desynchronize version
    * numbers from the batch build. Emitted intervals are therefore
    * always non-negative and version numbers monotone; the dropped
    * straggler is the same trade every watermark operator here
    * makes, just enforced per user since SCD state never expires.
    *
    * No timeout: the open version IS the dimension's current row —
    * state is O(users), the inherent floor of any SCD build (a
    * dimension that forgets a user's current state cannot version
    * their next change correctly).
    */
  def scd2(spark: SparkSession, events: Dataset[Event])
      : Dataset[Scd2Out] = {
    import spark.implicits._

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[Scd2State]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var cur = state.getOption
          val out = Seq.newBuilder[Scd2Out]
          for (e <- sorted) {
            val t = micros(e.ts)
            cur match {
              case Some(c) if t < c.last_ts_us =>
              // late straggler: dropped (see Scaladoc)
              case Some(c) if c.state_type != e.event_type =>
                out += Scd2Out(userId, c.version, c.state_type,
                  c.valid_from_us, t)
                cur = Some(Scd2State(c.version + 1, e.event_type, t, t))
              case Some(c) => // same type: fold into the open version
                cur = Some(c.copy(last_ts_us = t))
              case None =>
                cur = Some(Scd2State(1L, e.event_type, t, t))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** [[scd2AsOf]]'s per-user state: the open SCD-2 version plus a
    * served flag (the as-of row must emit exactly once). Public for
    * Spark's state encoder codegen.
    */
  case class Scd2AsOfState(version: Long, state_type: String,
      valid_from_us: Long, last_ts_us: Long, served: Boolean)

  case class Scd2AsOfOut(user_id: Long, version: Long,
      state_asof: String, valid_from: Long, asof_ts: Long)

  /** Streaming twin of q61's TIME-TRAVEL read: an AS-OF lookup
    * served from the LIVE SCD-2 state store instead of a replayed
    * history (the q60→q61 pair's missing streaming half — q60's
    * cdcApply maintains state, this READS it at a point in time).
    * Per user the state machine is exactly [[scd2]]'s (change-only
    * versioning, same-type folding, the late-straggler drop); the
    * as-of row for `asofUs` emits EXACTLY ONCE, at the first moment
    * it becomes FINAL:
    *
    *   - a change at `t > asofUs` closes the version covering the
    *     as-of point → emit it immediately (the cross-batch close
    *     case the parity spec pins);
    *   - no such change: the open version covers `asofUs` forever —
    *     final once the EVENT-TIME watermark passes the as-of point
    *     (the [[transitions]] expiry discipline), emitted from the
    *     timeout and the state reclaimed.
    *
    * State is O(users) with a constant payload — the scd2 floor plus
    * one served bit; emission order is decided per user with no
    * global barrier, which is what makes the read serveable WHILE
    * the dimension keeps building (a batch q61 must re-scan the
    * event history per read). On in-order delivery the emitted set
    * equals the batch q61 rows for the same `asofUs`
    * (EventStreamSpec pins parity incl. a cross-batch version close
    * and a timeout-served open version).
    */
  def scd2AsOf(spark: SparkSession, events: Dataset[Event],
      asofUs: Long, watermark: String = "1 hour")
      : Dataset[Scd2AsOfOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2AsOfState, Scd2AsOfOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[Scd2AsOfState]) =>
          if (state.hasTimedOut) {
            // Watermark passed the as-of point: the open version is
            // final for asofUs. Emit if it covers it, then reclaim —
            // the read is served; scd2 proper owns the dimension.
            val out = state.getOption.toSeq.collect {
              case c if !c.served && c.valid_from_us <= asofUs =>
                Scd2AsOfOut(userId, c.version, c.state_type,
                  c.valid_from_us, asofUs)
            }
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq
              .sortBy(e => (micros(e.ts), e.event_id))
            var cur = state.getOption
            val out = Seq.newBuilder[Scd2AsOfOut]
            for (e <- sorted) {
              val t = micros(e.ts)
              cur match {
                case Some(c) if t < c.last_ts_us =>
                // late straggler: dropped (the scd2 guard)
                case Some(c) if c.state_type != e.event_type =>
                  val closesAsOf =
                    !c.served && c.valid_from_us <= asofUs && t > asofUs
                  if (closesAsOf)
                    out += Scd2AsOfOut(userId, c.version, c.state_type,
                      c.valid_from_us, asofUs)
                  cur = Some(Scd2AsOfState(c.version + 1, e.event_type,
                    t, t, c.served || closesAsOf))
                case Some(c) =>
                  cur = Some(c.copy(last_ts_us = t))
                case None =>
                  cur = Some(Scd2AsOfState(1L, e.event_type, t, t,
                    served = false))
              }
            }
            // Liveness for a NEVER-QUIET user (review finding): the
            // event-time timeout only fires in a batch where the
            // group received no data, so a key active every batch
            // would defer its as-of row forever. Once the watermark
            // has passed the as-of point the open covering version
            // is final regardless (later events close at t >
            // watermark > asofUs; older-than-watermark stragglers
            // are dropped upstream) — so the DATA branch also serves
            // the read the first batch it observes that watermark.
            cur = cur.map { c =>
              if (!c.served && c.valid_from_us <= asofUs &&
                  state.getCurrentWatermarkMs() * 1000L > asofUs) {
                out += Scd2AsOfOut(userId, c.version, c.state_type,
                  c.valid_from_us, asofUs)
                c.copy(served = true)
              } else c
            }
            cur.foreach { c =>
              state.update(c)
              // Clamped past the watermark (Spark rejects timeouts at
              // or below it); served states keep a timeout too so the
              // slot reclaims once the watermark passes.
              state.setTimeoutTimestamp(
                math.max(asofUs / 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Stored as-of match: the user's latest click so far (the ONE-ROW
    * state the streaming as-of join keeps per user). Public for
    * Spark's state encoder codegen.
    */
  case class AsOfState(click_ts_us: Long, click_id: Long)

  case class AsOfOut(event_id: Long, user_id: Long, ts_us: Long,
      click_id: Long, click_ts_us: Long, gap_us: Long)

  /** Streaming twin of the batch as-of join (q21's "last click
    * before each purchase"): per-user state is EXACTLY ONE row — the
    * latest click seen so far — and each purchase emits immediately
    * with that match attached, the q51-twin discipline applied to
    * the §C flagship operator. Matches the batch
    * [[graft.operators.AsOfJoin]] semantics on ordered input:
    * inclusive at equal timestamps (clicks at a purchase's own ts
    * DO match — clicks process first within a batch regardless of
    * event_id order), the q21 pre-aggregation's max-click_id-per-
    * (user, ts) reproduced by ascending-event_id overwrite, and
    * purchases with no prior click DROP (q21's isNotNull filter).
    *
    * State is O(ACTIVE users): a stored click older than
    * `idleGapMicros` (by event time, watermark-driven — the
    * [[transitions]] expiry discipline) is reclaimed, so purchases
    * past that horizon see no match — an attribution-window bound,
    * the same bounded-state trade every watermark operator here
    * makes, and what keeps this runnable forever where the batch
    * union+window needs the full history.
    */
  def asofLastClick(spark: SparkSession, events: Dataset[Event],
      idleGapMicros: Long = 24L * 3600 * 1000000,
      watermark: String = "1 hour"): Dataset[AsOfOut] = {
    import spark.implicits._

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[AsOfState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // Clicks sort BEFORE purchases at equal ts (batch as-of
            // is inclusive: a same-ts click is in the preceding
            // frame); ascending event_id makes the last same-ts
            // click overwrite = q21's max(click_id) pre-aggregation.
            val sorted = rows.toSeq.sortBy(e =>
              (micros(e.ts), e.event_type != "click", e.event_id))
            var last = state.getOption
            val out = Seq.newBuilder[AsOfOut]
            for (e <- sorted) {
              val t = micros(e.ts)
              if (e.event_type == "click")
                last = Some(AsOfState(t, e.event_id))
              else if (e.event_type == "purchase")
                last.foreach { l =>
                  out += AsOfOut(e.event_id, userId, t, l.click_id,
                    l.click_ts_us, t - l.click_ts_us)
                }
            }
            last match {
              case Some(l) =>
                state.update(l)
                state.setTimeoutTimestamp(
                  math.max((l.click_ts_us + idleGapMicros) / 1000 + 1,
                    state.getCurrentWatermarkMs() + 1))
              case None =>
            }
            out.result().iterator
          }
      }
  }
  /** One changelog record for the CDC-apply stream: `op` is
    * 'I'|'U'|'D', `(tsl, event_id)` the total sequence order.
    * Public for Spark's state/row encoder codegen.
    */
  case class CdcChange(key: Long, tsl: Long, event_id: Long,
      op: String, bal_c: Long, seg: String)

  case class CdcState(tsl: Long, event_id: Long, op: String,
      bal_c: Long, seg: String)

  case class CdcOut(key: Long, tsl: Long, event_id: Long, op: String,
      bal_c: Long, seg: String)

  /** Streaming twin of the batch MERGE/CDC-apply (q60's
    * operators.Merge.applyChangelog): a changelog stream folds into
    * a per-key LATEST-CHANGE-WINS state (exactly one row per key —
    * the minimal upsert-view state), and each micro-batch emits the
    * key's post-batch row: op I/U = the upserted values, op D = a
    * tombstone. Cross-batch the sequence order still rules: a later
    * batch carrying an EARLIER (tsl, event_id) is ignored (the
    * scd2/as-of late-data discipline), so replayed or out-of-order
    * CDC batches cannot regress the view — the same idempotence the
    * batch operator pins. EventStreamSpec pins parity: the
    * max-sequence emitted row per key equals the batch post-merge
    * snapshot (tombstones = keys the batch apply deleted).
    */
  def cdcApply(spark: SparkSession, changes: Dataset[CdcChange])
      : Dataset[CdcOut] = {
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[CdcState, CdcOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[CdcChange],
            state: GroupState[CdcState]) =>
          var cur = state.getOption
          var applied = false
          for (c <- rows.toSeq.sortBy(c => (c.tsl, c.event_id))) {
            val newer = cur.forall(s =>
              c.tsl > s.tsl || (c.tsl == s.tsl && c.event_id > s.event_id))
            if (newer) {
              cur = Some(CdcState(c.tsl, c.event_id, c.op, c.bal_c, c.seg))
              applied = true
            }
          }
          cur match {
            case Some(s) if applied =>
              state.update(s)
              Iterator.single(
                CdcOut(key, s.tsl, s.event_id, s.op, s.bal_c, s.seg))
            case _ => Iterator.empty
          }
      }
  }
}
