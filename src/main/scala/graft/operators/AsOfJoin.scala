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
  * payload wins is plan-dependent. The matched right row is picked
  * ATOMICALLY (one `last`/`first` over a STRUCT of all payload
  * columns): a NULL payload value in the matched row stays NULL
  * rather than backfilling per-column from an older/newer row, so
  * the tolerance bound always validates the same row whose values
  * are returned.
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
  *   Requires a timestamp-typed `tsCol`, as does
  *   `direction = "nearest"` (both do microsecond gap arithmetic on
  *   the matched timestamp); backward/forward without tolerance work
  *   on any orderable type.
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
    // Tolerance and nearest both do microsecond arithmetic on the
    // matched right timestamp.
    if (toleranceUs.isDefined || direction == "nearest")
      require(right.schema(tsCol).dataType ==
          org.apache.spark.sql.types.TimestampType,
        s"toleranceUs and direction='nearest' need a timestamp-typed " +
          s"'$tsCol', got ${right.schema(tsCol).dataType.simpleString}")
    val reserved = Seq("_side", "_p_row", "_asof_row") ++
      payloadCols.map("asof_" + _)
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with reserved as-of names: " +
        reserved.filter(leftCols.contains).mkString(","))
    // The whole matched right row travels as ONE struct (`_rts` = the
    // right timestamp, backing the tolerance predicate and the
    // nearest-side choice) so the pick is atomic — never a per-column
    // ignoreNulls backfill mixing values from different right rows.
    val rowType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => org.apache.spark.sql.types.StructField(c,
        right.schema(c).dataType)) :+
        org.apache.spark.sql.types.StructField("_rts",
          right.schema(tsCol).dataType))

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
      leftCols.map(col) ++ Seq(lit(lSide).as("_side"),
        lit(null).cast(rowType).as("_p_row")): _*)
    val rTagged = rClean.select(
      leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(rSide).as("_side"),
          struct(payloadCols.map(col) :+ col(tsCol).as("_rts"): _*)
            .cast(rowType).as("_p_row")): _*)

    val ordered = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc)
    val wB = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bwd = last(col("_p_row"), ignoreNulls = true).over(wB)
    val fwd = first(col("_p_row"), ignoreNulls = true).over(wF)
    val pick = direction match {
      case "nearest" =>
        // Both picks over the ONE sorted partition (same window
        // partition+ordering → one shuffle and sort feeds both
        // frames); per row, backward wins unless forward is strictly
        // closer.
        val useBwd = bwd.isNotNull && (fwd.isNull ||
          (unix_micros(col(tsCol)) - unix_micros(bwd.getField("_rts"))) <=
            (unix_micros(fwd.getField("_rts")) - unix_micros(col(tsCol))))
        when(useBwd, bwd).otherwise(fwd)
      case "backward" => bwd
      case _          => fwd
    }
    val matched = lTagged.union(rTagged)
      .select(leftCols.map(col) ++
        Seq(col("_side"), pick.as("_asof_row")): _*)
      .filter(col("_side") === lSide)
    val row = col("_asof_row")
    val outPayloads = toleranceUs match {
      case None =>
        payloadCols.map(c => row.getField(c).as("asof_" + c))
      case Some(tol) =>
        val rts = row.getField("_rts")
        val gap = direction match {
          case "backward" => unix_micros(col(tsCol)) - unix_micros(rts)
          case "forward"  => unix_micros(rts) - unix_micros(col(tsCol))
          case _          => abs(unix_micros(col(tsCol)) - unix_micros(rts))
        }
        val inTol = rts.isNotNull && gap <= tol
        payloadCols.map(c =>
          when(inTol, row.getField(c)).otherwise(lit(null)).as("asof_" + c))
    }
    matched.select(leftCols.map(col) ++ outPayloads: _*)
  }
}
