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

  /** Resample an irregular per-key time series onto a fixed `step` grid with
    * forward fill (last known value) — the gap-fill primitive for turning
    * event streams into regular feature series. Per (key, bucket) the kept
    * observation is the latest-by-ts (max value on exact-ts ties), a fully
    * deterministic rule on any engine; each key's grid spans ITS OWN
    * min..max bucket, so the first grid row is always observed and the fill
    * never produces nulls.
    *
    * Output: (key, bucket, v_fill, observed 0|1).
    *
    * Scale: one shuffle keyed (key, bucket) for the per-bucket pick, one
    * keyed (key) for span + the fill window; the grid explode is map-side.
    * Size `step` against real spans — a key spanning years at second
    * granularity explodes its own grid (use a coarser step or split the
    * span).
    */
  def resampleLastKnown(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, step: Long): DataFrame = {
    require(step > 0, "step must be positive")
    val obs = df.select(col(keyCol).as("k"), col(tsCol).cast("long").as("t"),
      col(valueCol).cast("double").as("v"))
      .withColumn("b", expr(s"t DIV $step"))
    val latest = obs.groupBy("k", "b").agg(max(col("t")).as("mt"))
      .select(col("k").as("lk"), col("b").as("lb"), col("mt"))
    val picked = obs.join(latest,
        col("k") === col("lk") && col("b") === col("lb") &&
          col("t") === col("mt"))
      .groupBy("k", "b").agg(max(col("v")).as("v"))
    val grid = obs.groupBy(col("k"))
      .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
      .select(col("k"), explode(sequence(col("b0"), col("b1"))).as("b"))
    val fill = Window.partitionBy(col("k")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(picked, Seq("k", "b"), "left")
      .select(col("k").as(keyCol), col("b").as("bucket"),
        last(col("v"), ignoreNulls = true).over(fill).as("v_fill"),
        when(col("v").isNotNull, 1).otherwise(0).as("observed"))
  }
}
