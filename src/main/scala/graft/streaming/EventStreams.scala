package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch event analytics
  * (graft.operators.Events): the same logical aggregations expressed
  * as incremental queries with watermarks and keyed state.
  *
  * Design: `readStream` -> narrow transforms -> windowed agg /
  * `flatMapGroupsWithState` -> any sink. At cluster scale the state
  * store partitions by key (user_id) across executors; watermarks bound
  * state size, so an unbounded stream runs in bounded memory.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open a file-based event stream (parquet files appearing in a
    * directory — swap for kafka/rate sources unchanged). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling-window counts with a watermark: late events beyond
    * `lateness` are dropped and window state is reclaimed. */
  def tumblingCounts(
      events: DataFrame,
      size: String = "1 hour",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), size), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Stream-stream inner join with bounded state: match each
    * `leftType` event to the `rightType` events of the same user
    * occurring AT OR AFTER it, within `within` (directional —
    * click → purchase attribution; a purchase before the click never
    * matches). Both sides carry watermarks and the join condition
    * bounds the event-time distance, so each side's state evicts as
    * the other side's watermark advances — the only join shape that
    * runs unbounded streams in bounded memory. Late rows beyond
    * `lateness` drop like any watermarked op. */
  def correlate(
      events: DataFrame,
      leftType: String,
      rightType: String,
      within: String = "30 minutes",
      lateness: String = "1 hour"): DataFrame = {
    val left = events.filter(col("event_type") === leftType)
      .select(col("user_id").as("l_user"), col("ts").as("l_ts"),
        col("event_id").as("l_event"))
      .withWatermark("l_ts", lateness)
    val right = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_event"), col("value").as("r_value"))
      .withWatermark("r_ts", lateness)
    left.join(right,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col("l_user").as("user_id"), col("l_event"), col("r_event"),
        col("l_ts"), col("r_ts"), col("r_value"))
  }

  /** Sliding-window variant (same state bounds). */
  def slidingCounts(
      events: DataFrame,
      size: String = "1 hour",
      slide: String = "30 minutes",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"))

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(
      sessionStart: Long, lastTs: Long, nEvents: Long)

  final case class SessionSummary(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  /** Custom keyed state: emit a session summary when a user is idle
    * longer than `gapMinutes` (event-time sessionization via
    * flatMapGroupsWithState with event-time timeout). The streaming
    * analogue of Events.sessionize. */
  def sessionSummaries(
      events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fn(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionSummary] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[SessionSummary]
      var st = state.getOption.orNull
      if (state.hasTimedOut) {
        if (st != null)
          out ::= SessionSummary(userId, new Timestamp(st.sessionStart),
            new Timestamp(st.lastTs), st.nEvents)
        state.remove()
        st = null
      }
      sorted.foreach { e =>
        val t = e.ts.getTime
        if (st == null) st = SessionState(t, t, 1L)
        else if (t - st.lastTs > gapMs) {
          out ::= SessionSummary(userId, new Timestamp(st.sessionStart),
            new Timestamp(st.lastTs), st.nEvents)
          st = SessionState(t, t, 1L)
        } else st = st.copy(lastTs = math.max(st.lastTs, t),
          nEvents = st.nEvents + 1L)
      }
      if (st != null) {
        state.update(st)
        state.setTimeoutTimestamp(st.lastTs + gapMs)
      }
      out.reverseIterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
