package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the batch twin of
  * [[graft.streaming.EventStreams.sessionizeEventTime]]: a session is a
  * maximal run of a user's events where consecutive gaps are ≤ `gap`.
  *
  * Shape: one shuffle on the user key, then two windowed passes inside the
  * sorted partition (lag → new-session flag, running sum → session ordinal).
  * Per-user event counts are bounded in any real activity table, so the
  * partition-local sort is the same cost class as any windowed aggregate at
  * 100 TB; there is no global window anywhere.
  */
object Sessions {

  /** Events + (session_seq, session_id): `session_seq` numbers a user's
    * sessions 1..n in time order; `session_id` is a stable global id
    * (user, seq). `tsCol` must be numeric (epoch seconds/micros — pick `gap`
    * in the same unit).
    */
  def gapSessions(events: DataFrame, userCol: String, tsCol: String,
      gap: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val newSession = when(
      col(tsCol) - lag(col(tsCol), 1).over(byUser) > gap, 1
    ).otherwise(lit(0)) // first event of a user: lag is null → otherwise(0)…
    events
      .withColumn("__new", when(lag(col(tsCol), 1).over(byUser).isNull, 1)
        .otherwise(newSession))
      .withColumn("session_seq",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__new")
  }

  /** Per-session rollup: bounds, duration, event count. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      gap: Long): DataFrame =
    gapSessions(events, userCol, tsCol, gap)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"),
        count(lit(1)).as("n_events"))
}
