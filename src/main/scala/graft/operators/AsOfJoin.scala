package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the payload of the LATEST
  * right row with `right.ts <= left.ts` within the same key — the
  * "most recent quote for each trade" / "last click before each
  * purchase" operator.
  *
  * Spark has no native as-of join; the naive encodings both fail at
  * scale: a range join (`l.key = r.key AND r.ts <= l.ts` + window)
  * materializes every (left, earlier-right) pair before pruning —
  * quadratic per key — and a correlated max-subquery plans as the
  * same thing. This implementation is the sort-merge shape instead:
  * UNION both sides tagged, ONE shuffle on the key, then a
  * running `last(payload, ignoreNulls)` window over (ts, side)
  * ordering — right rows sort before left rows at equal ts, so a
  * left row sees a same-timestamp right row (inclusive as-of,
  * DuckDB/kdb semantics). Linear work per key, no pair explosion.
  *
  * Determinism: callers must ensure at most one right row per
  * (key, ts) — pre-aggregate duplicates — otherwise which same-ts
  * payload wins is plan-dependent. Right-payload NULLs are treated
  * as "no value" by `last(ignoreNulls)` (the match looks further
  * back); keep payloads non-null for strict row semantics.
  *
  * @param payloadCols right-side columns to attach; emitted as
  *   `asof_<name>`, NULL when no right row is at-or-before the left
  *   row's timestamp.
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs payload columns")
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left side")
    val reserved = Seq("_side") ++ payloadCols.map("_p_" + _) ++
      payloadCols.map("asof_" + _)
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with reserved as-of names: " +
        reserved.filter(leftCols.contains).mkString(","))
    val payloadTypes = payloadCols.map(c => c -> right.schema(c).dataType)

    // Null-key/null-ts right rows can never match under SQL ASOF
    // semantics (NULL = NULL is not a match; NULL ts satisfies no
    // comparison) — but a window PARTITION BY groups nulls together,
    // which would hand null-key left rows a null-key right payload.
    // Dropping them here restores DuckDB/kdb behavior: null-key left
    // rows pass through with null payloads.
    val rClean = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)

    // Align schemas: left rows carry null payloads, right rows carry
    // null left-only columns. _side orders right (0) before left (1)
    // at equal timestamps.
    val lTagged = left.select(
      leftCols.map(col) ++ Seq(lit(1).as("_side")) ++
        payloadTypes.map { case (c, t) => lit(null).cast(t).as("_p_" + c) }: _*)
    val rTagged = rClean.select(
      leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("_side")) ++
        payloadTypes.map { case (c, _) => col(c).as("_p_" + c) }: _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.union(rTagged)
      .select(
        leftCols.map(col) ++ Seq(col("_side")) ++
          payloadCols.map(c =>
            last(col("_p_" + c), ignoreNulls = true).over(w)
              .as("asof_" + c)): _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
