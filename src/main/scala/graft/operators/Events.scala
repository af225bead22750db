package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` stream table (batch form;
  * the streaming twins live in graft.streaming). */
object Events {

  /** Tumbling-window aggregate: one shuffle on (window, event_type);
    * partial aggregation happens map-side automatically. */
  def tumblingCounts(events: DataFrame, every: String = "1 hour"): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("total_value"))

  /** Sliding-window aggregate via Spark's `window` (update-mode shape
    * shared with the streaming variant). */
  def slidingCounts(
      events: DataFrame,
      size: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"))

  /** Sessionization: a session breaks after `gapMinutes` of inactivity.
    * Gaps-and-islands with lag + running sum — one shuffle on user_id. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // cast handles TIMESTAMP_NTZ inputs (session TZ is pinned to UTC)
    val secs = (c: org.apache.spark.sql.Column) =>
      unix_timestamp(c.cast("timestamp"))
    val withGap = events.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          secs(col("ts")) - secs(col("prev_ts")) > gapMinutes * 60L, 1)
          .otherwise(0))
    withGap.withColumn("session_id",
      sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-user session summary (count, longest session length). */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("events_in_session"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("events_in_session")).as("max_session_events"))
}
