package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: assigns a session id per (user, event)
  * where a new session starts when the gap to the previous event
  * exceeds `gapSeconds`.
  *
  * Shape: two window functions over the same (partitionBy user,
  * orderBy ts) window — ONE shuffle on user_id, then lag + running
  * sum run within partitions. At 100 TB this is the canonical
  * "sessionize without self-join" plan; the alternative (range
  * self-join) is quadratic per user.
  */
object Sessionize {

  /** @return input plus `session_id` (per-user ordinal, starts at 1).
    * Gap comparison is in integral epoch microseconds — no float or
    * truncate-to-seconds boundary ambiguity.
    */
  def apply(events: DataFrame, userCol: String, tsCol: String,
      gapMicros: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsCol)
    val tsUs = unix_micros(col(tsCol))
    events
      .withColumn("_prev_sec", lag(tsUs, 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev_sec").isNull ||
          tsUs - col("_prev_sec") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id",
        sum("_new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_sec", "_new_session")
  }
}
