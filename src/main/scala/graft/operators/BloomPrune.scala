package graft.operators

import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{Column, DataFrame}

/** Bloom-filter prune + exact-verify join composition — the runtime
  * pre-filter that turns "semi-join 100 TB of fact rows against a
  * selective build side" into "map-side drop almost everything, then
  * join only the survivors".
  *
  * Spark's own `InjectRuntimeFilter` rule makes exactly this move
  * when statistics let it; this operator is the EXPLICIT, always-on
  * version for pipeline stages where the build side is known
  * selective by construction (an eval-suite digest list, a blocklist,
  * one day of a rolling corpus), so the plan never silently degrades
  * to a full-corpus shuffle when stats are missing or stale.
  *
  * Shape (all in-plan — no driver collect):
  *   1. build: `bloom_filter_agg(xxhash64(key))` over the small side
  *      — a mergeable TypedImperativeAggregate, partial-agg'd per
  *      partition and merged once; the result is ONE binary cell.
  *   2. the bloom reaches the probe side as a SCALAR SUBQUERY (the
  *      same shape InjectRuntimeFilter emits): executed once,
  *      folded to a literal at runtime, shipped with the task —
  *      never a shuffled or cross-joined column.
  *   3. prune: `might_contain(bloom, xxhash64(key))` as a codegen'd
  *      FILTER on the big side — no false negatives, so nothing is
  *      lost; false positives (rate `fpp`) pass through to…
  *   4. verify: the exact left-semi equi-join, now over ~|matches| +
  *      fpp·|big| rows instead of |big|.
  *
  * Net semantics = the exact semi-join, independent of the bloom
  * parameters; the bloom only moves work off the shuffle. At 100 TB:
  * the build side aggregates to ≤ `numBits/8` bytes (1 MiB at the
  * defaults), the fact scan drops (1-fpp) of non-matching rows before
  * any exchange, and the verify join shuffles only survivors.
  */
object BloomPrune {

  /** Rows of `big` whose `key` appears in `small.select(key)` —
    * computed as bloom-prune then exact left-semi verify.
    *
    * @param expectedItems build-side cardinality estimate (sizes the
    *   filter; correctness is unaffected)
    * @param fpp target false-positive rate of the PRUNE step (the
    *   verify join removes all false positives from the result)
    */
  /** The PRUNE stage alone: rows of `big` whose `bigKey` MIGHT be in
    * `small`'s `smallKey` set (no false negatives; `fpp` false
    * positives pass). Composable wherever the caller follows with
    * its own exact step — [[semiJoin]] adds a left-semi verify, the
    * decontamination path feeds its gram equi-join + substring
    * verify.
    */
  def pruneMightContain(big: DataFrame, bigKey: Column,
      small: DataFrame, smallKey: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    // Standard Bloom sizing: m = -n·ln(p)/ln(2)², capped under
    // Spark's runtime-filter creation ceiling (64 Mbit) so the
    // aggregate's own input check can never reject the plan.
    val numBits = math.min(
      math.ceil(-expectedItems * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong,
      33554432L)
    val buildHash = ColumnBridge.expression(xxhash64(smallKey))
    val bloomAgg = new BloomFilterAggregate(buildHash,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bloomPlan = small
      .agg(ColumnBridge.column(bloomAgg).as("bloom")).queryExecution.analyzed
    val mightContain: Column = ColumnBridge.column(
      BloomFilterMightContain(ScalarSubquery(bloomPlan),
        ColumnBridge.expression(xxhash64(bigKey))))
    big.filter(mightContain)
  }

  def semiJoin(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame =
    // Semi join dedups the build side itself — no distinct needed.
    pruneMightContain(big, big(key), small, col(key), expectedItems, fpp)
      .join(small.select(key), Seq(key), "left_semi")
}
