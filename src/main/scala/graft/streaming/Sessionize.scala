package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via flatMapGroupsWithState — the
  * KeyValueGroupedDataset custom-state path for semantics the
  * built-in session_window cannot express (here: emit rich session
  * summaries with first/last values, and close sessions on
  * event-time timeout).
  *
  * State per key is ONE small SessionState (constant size); the
  * event-time timeout ties state eviction to the watermark, so total
  * state is O(active users within the watermark horizon) — the
  * bounded-state discipline that keeps this runnable on an unbounded
  * 100 TB/day stream.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_ms: Long, value: Double)

  final case class SessionState(start_ms: Long, last_ms: Long,
      n_events: Long, sum_value: Double)

  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  /** Session gap: events from one user closer than this belong to
    * the same session. */
  val DefaultGapMs: Long = 30L * 60 * 1000

  private def fold(state: Option[SessionState], evs: Seq[Event],
                   gapMs: Long): (Option[SessionState], List[Session]) =
    evs.sortBy(e => (e.ts_ms, e.value)).foldLeft((state, List.empty[Session])) {
      case ((None, closed), e) =>
        (Some(SessionState(e.ts_ms, e.ts_ms, 1L, e.value)), closed)
      case ((Some(s), closed), e) if e.ts_ms - s.last_ms <= gapMs =>
        (Some(s.copy(last_ms = e.ts_ms max s.last_ms,
          n_events = s.n_events + 1, sum_value = s.sum_value + e.value)), closed)
      case ((Some(s), closed), e) =>
        (Some(SessionState(e.ts_ms, e.ts_ms, 1L, e.value)),
          Session(0L, s.start_ms, s.last_ms, s.n_events, s.sum_value) :: closed)
    }

  /** The state-update function (public: unit-tested directly, the
    * same code path the streaming query runs). */
  def updateState(gapMs: Long)(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, s.start_ms, s.last_ms, s.n_events, s.sum_value))
    } else {
      val (open, closed) = fold(state.getOption, events.toSeq, gapMs)
      open.foreach { s =>
        state.update(s)
        // evict once the watermark passes last event + gap
        state.setTimeoutTimestamp(s.last_ms + gapMs)
      }
      closed.reverseIterator.map(_.copy(user_id = userId))
    }
  }

  /** Streaming sessionization: requires a watermark on the source's
    * event-time column mapped into `ts_ms` upstream. */
  def apply(events: Dataset[Event],
            gapMs: Long = DefaultGapMs): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val ss = Encoders.product[SessionState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout())(updateState(gapMs))
  }
}
