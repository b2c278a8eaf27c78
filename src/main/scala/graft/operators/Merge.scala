package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE / CDC-apply: apply a changelog to a base snapshot, producing
  * the post-merge snapshot — the WRITE side of the warehouse staple
  * whose read side the engine already ships (q57 builds SCD-2
  * versions from an event stream, d34 diffs two snapshots, q21
  * point-in-time-joins them; this is the operator that produces the
  * next snapshot those consume).
  *
  * Semantics (latest-change-wins, the Delta/Iceberg MERGE shape):
  *   - per key, only the LAST changelog record by the caller's
  *     sequence columns applies (earlier records are superseded —
  *     a full CDC batch replays correctly without intermediate
  *     states materializing);
  *   - last op ∈ {I, U} → the row exists with the change's values
  *     (UPSERT: I and U converge deliberately, so a replayed batch
  *     whose I raced an existing row cannot fork the result);
  *   - last op = D → the row is absent (a base row may be deleted;
  *     a D on an unknown key is a no-op);
  *   - keys the changelog never mentions keep their base row.
  *
  * Applying the same changelog twice is a NO-OP by construction
  * (OperatorsSpec pins it): the second apply upserts identical
  * values and re-deletes absent keys.
  *
  * Scale shape: ONE exchange of the changelog on the key feeds the
  * row_number window (per-partition state = one counter), and the
  * survivors join the base with ONE equi-shuffle on the same key —
  * the base is never windowed and never shuffled twice. The
  * changelog is typically ≪ base (a day's CDC vs the table), so AQE
  * broadcasts the latest-change side when it fits; nothing here
  * prevents that.
  */
object Merge {

  /** @param base     current snapshot; must contain `keyCol` and
    *                 `valueCols`
    * @param changes  changelog with `keyCol`, `opCol` ('I'|'U'|'D'),
    *                 `valueCols`, and `seqCols` ordering changes
    *                 within a key (latest wins; make the total order
    *                 unique — e.g. (ts, event_id) — or the pick is
    *                 engine-dependent)
    * @return post-merge snapshot: `keyCol` :: `valueCols`
    * @note the implementation reserves helper column names `_rn`,
    *   `_op`, and `_c_<valueCol>` — an input frame already carrying
    *   one would make the op gating ambiguous, so the call fails
    *   loudly up front instead of risking an analysis error (or
    *   worse, silently gating on the caller's column)
    */
  def applyChangelog(base: DataFrame, changes: DataFrame,
      keyCol: String, seqCols: Seq[Column], opCol: String,
      valueCols: Seq[String]): DataFrame = {
    val reserved = "_rn" +: "_op" +: valueCols.map(c => s"_c_$c")
    val inUse = (base.columns ++ changes.columns).toSet
    val clash = reserved.filter(inUse)
    require(clash.isEmpty,
      s"applyChangelog reserves helper columns ${reserved.mkString(", ")}; " +
        s"rename conflicting input columns: ${clash.mkString(", ")}")
    val last = changes
      .withColumn("_rn", row_number().over(Window.partitionBy(keyCol)
        .orderBy(seqCols.map(_.desc): _*)))
      .filter(col("_rn") === 1)
      .select(col(keyCol) +: col(opCol).as("_op") +:
        valueCols.map(c => col(c).as(s"_c_$c")): _*)
    base
      .join(last, Seq(keyCol), "full_outer")
      // D wins: drop the key whether or not the base had it. Keys
      // without a change keep the base row (_op null ⇒ base values;
      // base-only rows always have at least their key non-null, but
      // value columns may be null — gate on _op, not on a value).
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(col(keyCol) +: valueCols.map(c =>
        when(col("_op").isNotNull, col(s"_c_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
