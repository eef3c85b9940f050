package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom stateful streaming operator
  * (SURVEY §2.10 "stateful ops"): group each user's events into
  * sessions separated by ≥ `gap`, emitting (user, session start/end,
  * event count, value sum).
  *
  * Two equivalent implementations (parity asserted in StreamSpec):
  *  - [[batch]]: lag + running sum of session-break flags — one window
  *    shuffle, SQL-expressible (oracle key q_sessionize);
  *  - [[streaming]]: `flatMapGroupsWithState` with event-time timeout —
  *    per-key state is one open session (constant memory per user),
  *    sessions emit when the watermark passes their close.
  */
object Sessionize {

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Batch formulation: session break = gap to previous event > gapSec;
    * session id = running count of breaks per user. */
  def batch(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // integer microsecond math on both engines (oracle: epoch_us) —
    // second-truncation would disagree with the oracle at boundaries
    val newSession = when(
      unix_micros(col("ts")) -
        lag(unix_micros(col("ts")), 1).over(byUser) > gapSec * 1000000L, 1)
      .otherwise(lit(0))
    events
      .withColumn("__brk", newSession)
      .withColumn("__sid", sum(col("__brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .drop("__sid")
  }

  /** Streaming formulation. Input must be watermarked on `ts`. */
  def streaming(events: Dataset[SessionEvent], gapSec: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos((us % 1000000).toInt * 1000)
      t
    }
    def micros(ts: java.sql.Timestamp): Long =
      ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000

    def flush(uid: Long, st: SessionState): Session =
      Session(uid, toTs(st.start), toTs(st.end),
        st.n, math.rint(st.sum * 100) / 100)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the open session's close → emit it
            val out = state.getOption.map(flush(uid, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var cur = state.getOption
            val closed = scala.collection.mutable.ListBuffer.empty[Session]
            // Same late-event discard as Scd2Stream: flatMapGroupsWithState
            // still DELIVERS events below the watermark (unlike windowed
            // aggs). Applying one would extend — or, after an event-time
            // timeout already emitted the session, silently re-open — a
            // session that downstream has been promised is final. Drop
            // them: the discard the watermark already declares.
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            sorted.foreach { e =>
              val t = micros(e.ts)
              if (t >= wmUs) cur match {
                case Some(st) if t - st.end <= gapSec * 1000000L =>
                  cur = Some(SessionState(st.start, math.max(st.end, t),
                    st.n + 1, st.sum + e.value))
                case Some(st) =>
                  closed += flush(uid, st)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // a late batch can put the session end below the watermark —
              // Spark rejects timeouts in the past, so clamp forward
              state.setTimeoutTimestamp(math.max(st.end / 1000 + gapSec * 1000,
                state.getCurrentWatermarkMs() + 1000))
            }
            closed.iterator
          }
      }
  }
}
