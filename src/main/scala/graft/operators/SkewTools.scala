package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregation.
  *
  * AQE's skew handling covers JOINS; a skewed AGGREGATION key (one
  * key holding a large share of all rows — the "null user_id" /
  * "bot traffic" shape) still lands on one reducer after the
  * exchange, because partial aggregation only collapses values
  * within each map partition. Salting splits the hot key across
  * `salts` reducers in a first stage, then combines the per-salt
  * partials — turning one straggler task into `salts` even ones at
  * the cost of a second (tiny: keys × salts rows) shuffle.
  *
  * The salt is a row-local counter, not a value hash: hashing a
  * constant-valued hot key would put every row back in one bucket.
  * Aggregation results are invariant to how rows are split, so the
  * salt needs no cross-run stability.
  */
object SkewTools {

  /** count + sum of `valCol` per `keyCol`, skew-safe. Output columns:
    * (keyCol, n, sum).
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valCol: String,
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    df
      .withColumn("_salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_c"), sum(col(valCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum("_c").cast("long").as("n"), sum("_s").as("sum"))
  }
}
