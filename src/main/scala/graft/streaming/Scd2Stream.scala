package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD Type 2 — the `flatMapGroupsWithState` formulation of
  * the batch [[graft.cdc.Scd2]] kernel (dbt `check`-strategy snapshot,
  * reference dbt_project/dbt/snapshots/users_snapshot.sql:1-18).
  *
  * Per-key state is exactly ONE open version (constant memory per key at
  * any history length). Each incoming change event either
  *  - opens the first version (new key),
  *  - is a no-op (check values unchanged — null-safe Option equality,
  *    mirroring the batch kernel's `<=>` fold), or
  *  - closes the open version at its `as_of` (emitted immediately,
  *    Append-mode-final: a closed version can never change again) and
  *    opens the next one.
  * Open versions are emitted with `valid_to = None` when the event-time
  * watermark passes the key's last activity (event-time timeout) — the
  * same drain pattern as [[Sessionize.streaming]].
  *
  * Values travel as `Map[colName -> value]` with absent key = NULL, so
  * the NULL-swap case — open=(NULL,"x") vs staged=("x",NULL) — compares
  * unequal and closes the row (the hash-based shortcut the batch kernel
  * deliberately avoids; see Scd2.scala doc). Stream/batch parity over a
  * multi-batch history, including that NULL swap, is asserted in
  * StreamSpec.
  */
object Scd2Stream {

  final case class Scd2Event(key: String, vals: Map[String, String],
      as_of: java.sql.Timestamp)
  final case class OpenState(vals: Map[String, String], validFromUs: Long,
      lastSeenUs: Long)
  final case class Scd2Version(key: String, vals: Map[String, String],
      valid_from: java.sql.Timestamp, valid_to: Option[java.sql.Timestamp])

  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos((us % 1000000).toInt * 1000)
    t
  }
  private def micros(ts: java.sql.Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000

  /** Input must be watermarked on `as_of`. `checkCols` are the dbt
    * check-strategy columns; other entries in `vals` ride along (their
    * latest value at each version open, like dbt's snapshot payload). */
  def streaming(events: Dataset[Scd2Event], checkCols: Seq[String])
      : Dataset[Scd2Version] = {
    val spark = events.sparkSession
    import spark.implicits._

    events.groupByKey(_.key)
      .flatMapGroupsWithState[OpenState, Scd2Version](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Scd2Event], state: GroupState[OpenState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the key's last activity → the open version
            // is final for this stream: emit it with valid_to = None
            val out = state.getOption.map(st =>
              Scd2Version(key, st.vals, toTs(st.validFromUs), None)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.as_of))
            var cur = state.getOption
            val closed = scala.collection.mutable.ListBuffer.empty[Scd2Version]
            // flatMapGroupsWithState still DELIVERS events older than the
            // watermark (unlike windowed aggs, which drop them). Applying
            // one would corrupt history: an event below the open version's
            // valid_from would close it with valid_to < valid_from
            // (inverted interval), and one arriving after an event-time
            // timeout would re-open a key whose final version was already
            // emitted (overlapping histories, impossible in Append mode).
            // Drop them — the same discard semantics the watermark already
            // promises downstream.
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            sorted.foreach { e =>
              val t = micros(e.as_of)
              if (t >= wmUs && cur.forall(st => t >= st.validFromUs))
              cur match {
                case Some(st)
                    if checkCols.forall(c => st.vals.get(c) == e.vals.get(c)) =>
                  cur = Some(st.copy(lastSeenUs = math.max(st.lastSeenUs, t)))
                case Some(st) =>
                  closed += Scd2Version(key, st.vals, toTs(st.validFromUs),
                    Some(toTs(t)))
                  cur = Some(OpenState(e.vals, t, t))
                case None =>
                  cur = Some(OpenState(e.vals, t, t))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // a late batch can put lastSeen below the watermark —
              // Spark rejects timeouts in the past, so clamp forward
              state.setTimeoutTimestamp(math.max(st.lastSeenUs / 1000 + 1000,
                state.getCurrentWatermarkMs() + 1000))
            }
            closed.iterator
          }
      }
  }
}
