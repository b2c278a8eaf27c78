package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the payload of the LATEST
  * right row with `right.ts <= left.ts` within the same key — the
  * "most recent quote for each trade" / "last click before each
  * purchase" operator — or, with `direction = "forward"`, the
  * EARLIEST right row with `right.ts >= left.ts` ("next event
  * at-or-after": the fill-after-quote / next-heartbeat shape).
  *
  * Spark has no native as-of join; the naive encodings both fail at
  * scale: a range join (`l.key = r.key AND r.ts <= l.ts` + window)
  * materializes every (left, earlier-right) pair before pruning —
  * quadratic per key — and a correlated max-subquery plans as the
  * same thing. This implementation is the sort-merge shape instead:
  * UNION both sides tagged, ONE shuffle on the key, then a running
  * `last(payload, ignoreNulls)` over the preceding frame (backward)
  * or `first(payload, ignoreNulls)` over the following frame
  * (forward), with (ts, side) ordering placing the right row inside
  * the frame at equal timestamps — inclusive as-of, DuckDB/kdb
  * semantics. Linear work per key, no pair explosion.
  *
  * Determinism: callers must ensure at most one right row per
  * (key, ts) — pre-aggregate duplicates — otherwise which same-ts
  * payload wins is plan-dependent. Right-payload NULLs are treated
  * as "no value" by ignoreNulls (the match looks further
  * back/ahead); keep payloads non-null for strict row semantics.
  *
  * @param payloadCols right-side columns to attach; emitted as
  *   `asof_<name>`, NULL when no right row is at-or-before
  *   (at-or-after) the left row's timestamp.
  * @param direction "backward" (default: latest at-or-before),
  *   "forward" (earliest at-or-after), or "nearest" (whichever of
  *   the two is temporally closer, ties to backward — pandas
  *   merge_asof semantics). Nearest computes BOTH picks over the
  *   SAME sorted partition (two frames, one shuffle+sort): the
  *   ordering places equal-ts right rows in the preceding frame
  *   only, which is harmless — an equal-ts match has gap 0 and the
  *   backward side wins that tie by definition.
  * @param toleranceUs maximum |left.ts − matched right.ts| in
  *   microseconds (pandas merge_asof's `tolerance`, the attribution
  *   window of click-attribution pipelines): a match staler than the
  *   bound yields NULL payloads, exactly as if no right row existed
  *   — the left row is kept either way. The as-of match is unique
  *   per left row, so the bound is a pure post-predicate on the
  *   matched timestamp: same one-shuffle plan, no pair scan.
  *   Requires a timestamp-typed `tsCol`.
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward/forward/nearest, got '$direction'")
    require(payloadCols.nonEmpty, "as-of join needs payload columns")
    require(toleranceUs.forall(_ >= 0), "tolerance must be >= 0")
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left side")
    // `_rts` is the internal matched-right-timestamp payload backing
    // the tolerance predicate and the nearest-side choice.
    val needRts = toleranceUs.isDefined || direction == "nearest"
    val allPayloads = payloadCols ++ (if (needRts) Seq("_rts") else Nil)
    val reserved = Seq("_side") ++ allPayloads.map("_p_" + _) ++
      allPayloads.map("asof_" + _)
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with reserved as-of names: " +
        reserved.filter(leftCols.contains).mkString(","))
    val payloadTypes = payloadCols.map(c => c -> right.schema(c).dataType) ++
      (if (needRts) Seq("_rts" -> right.schema(tsCol).dataType) else Nil)

    // Null-key/null-ts right rows can never match under SQL ASOF
    // semantics (NULL = NULL is not a match; NULL ts satisfies no
    // comparison) — but a window PARTITION BY groups nulls together,
    // which would hand null-key left rows a null-key right payload.
    // Dropping them here restores DuckDB/kdb behavior: null-key left
    // rows pass through with null payloads.
    val rClean = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)

    // Align schemas: left rows carry null payloads, right rows carry
    // null left-only columns. At equal timestamps the right row must
    // sit INSIDE the left row's frame: backward frames end at the
    // current row, so right sorts first (0) and left last (1);
    // forward frames start at the current row, so the tags flip.
    // Nearest uses the backward layout (see the direction scaladoc).
    val (lSide, rSide) = if (direction == "forward") (0, 1) else (1, 0)
    val lTagged = left.select(
      leftCols.map(col) ++ Seq(lit(lSide).as("_side")) ++
        payloadTypes.map { case (c, t) => lit(null).cast(t).as("_p_" + c) }: _*)
    val rTagged = rClean.select(
      leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(rSide).as("_side")) ++
        payloadTypes.map {
          case ("_rts", _) => col(tsCol).as("_p__rts")
          case (c, _)      => col(c).as("_p_" + c)
        }: _*)

    val ordered = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc)
    val wB = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def bwd(c: String) = last(col("_p_" + c), ignoreNulls = true).over(wB)
    def fwd(c: String) = first(col("_p_" + c), ignoreNulls = true).over(wF)
    val union = lTagged.union(rTagged)
    val matched = (direction match {
      case "nearest" =>
        // Both picks over the ONE sorted partition (same window
        // partition+ordering → one shuffle and sort feeds both
        // frames); per row, backward wins unless forward is strictly
        // closer.
        val bts = bwd("_rts")
        val fts = fwd("_rts")
        val useBwd = bts.isNotNull && (fts.isNull ||
          (unix_micros(col(tsCol)) - unix_micros(bts)) <=
            (unix_micros(fts) - unix_micros(col(tsCol))))
        union.select(
          leftCols.map(col) ++ Seq(col("_side")) ++
            allPayloads.map(c =>
              when(useBwd, bwd(c)).otherwise(fwd(c)).as("asof_" + c)): _*)
      case "backward" =>
        union.select(leftCols.map(col) ++ Seq(col("_side")) ++
          allPayloads.map(c => bwd(c).as("asof_" + c)): _*)
      case _ =>
        union.select(leftCols.map(col) ++ Seq(col("_side")) ++
          allPayloads.map(c => fwd(c).as("asof_" + c)): _*)
    }).filter(col("_side") === lSide)
      .drop("_side")
    toleranceUs match {
      case None =>
        if (needRts) matched.drop("asof__rts") else matched
      case Some(tol) =>
        val gap = direction match {
          case "backward" =>
            unix_micros(col(tsCol)) - unix_micros(col("asof__rts"))
          case "forward" =>
            unix_micros(col("asof__rts")) - unix_micros(col(tsCol))
          case _ =>
            abs(unix_micros(col(tsCol)) - unix_micros(col("asof__rts")))
        }
        val inTol = col("asof__rts").isNotNull && gap <= tol
        matched
          .select(leftCols.map(col) ++ payloadCols.map(c =>
            when(inTol, col("asof_" + c)).otherwise(lit(null))
              .as("asof_" + c)): _*)
    }
  }
}
