package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermark-ordered conversion-funnel CEP via flatMapGroupsWithState
  * — the streaming form of `RelQueries.funnelOf`: per user, the first
  * view, the first click STRICTLY after that view, the first purchase
  * STRICTLY after that click, each emitted exactly once as a stage
  * transition the moment it becomes final.
  *
  * Correctness under disorder: the batch funnel is defined over
  * event-time order, and a greedy fold is only correct if it consumes
  * events in that order. So events NEWER than the current watermark
  * are BUFFERED in state and only the prefix at or below the
  * watermark — which the watermark contract makes final — is folded,
  * sorted. The buffer is bounded by the disorder the watermark
  * admits; the folded machine is three longs. An event-time timeout
  * re-arms at the earliest buffered timestamp so the buffer flushes
  * when the watermark passes it even if the user goes quiet.
  *
  * Completed machines are kept (three longs) rather than removed:
  * removal would let a later stray view re-emit stage 1 for a user
  * who already converted. A production deployment bolts a TTL on via
  * the same timeout channel; the funnel semantics don't define one.
  *
  * Equivalence contract (spec-pinned): distinct (user, stage)
  * memberships equal `RelQueries.funnelOf` whenever cross-batch
  * disorder stays inside the watermark delay.
  */
object StreamFunnel {

  final case class Event(user_id: Long, event_type: String, ts_ms: Long)

  /** -1 = stage not reached; `pending` = events still above the
    * watermark, waiting to become final. */
  final case class State(t_view: Long, t_click: Long, t_purchase: Long,
      pending: Seq[Event])

  final case class Hit(user_id: Long, stage: String, ts_ms: Long)

  private val Empty = State(-1L, -1L, -1L, Nil)

  /** Fold FINAL events (must be event-time-sorted) into the 3-slot
    * machine. Processing in order makes each greedy "first" the
    * batch min: the first view is min(view), the first click after
    * t_view is min(click > t_view), etc. */
  def fold(uid: Long, s0: State, evs: Seq[Event]): (State, List[Hit]) =
    evs.foldLeft((s0, List.empty[Hit])) { case ((s, hits), e) =>
      e.event_type match {
        case "view" if s.t_view < 0 =>
          (s.copy(t_view = e.ts_ms), Hit(uid, "1_view", e.ts_ms) :: hits)
        case "click" if s.t_view >= 0 && s.t_click < 0 &&
            e.ts_ms > s.t_view =>
          (s.copy(t_click = e.ts_ms), Hit(uid, "2_click", e.ts_ms) :: hits)
        case "purchase" if s.t_click >= 0 && s.t_purchase < 0 &&
            e.ts_ms > s.t_click =>
          (s.copy(t_purchase = e.ts_ms),
            Hit(uid, "3_purchase", e.ts_ms) :: hits)
        case _ => (s, hits)
      }
    }

  /** The state-update function (public: unit-tested directly, the
    * same code path the streaming query runs). Also the timeout
    * path: a timed-out group arrives with an empty iterator and a
    * further-advanced watermark, ripening buffered events. */
  def updateState(uid: Long, events: Iterator[Event],
      state: GroupState[State]): Iterator[Hit] = {
    val wm = state.getCurrentWatermarkMs()
    val s0 = state.getOption.getOrElse(Empty)
    val (ripe, pending) = (s0.pending ++ events).partition(_.ts_ms <= wm)
    // equal-ts order cannot affect the STRICT stage comparisons, but
    // sort on (ts, type) anyway so the fold is fully deterministic
    val (s1, hits) = fold(uid, s0.copy(pending = Nil),
      ripe.sortBy(e => (e.ts_ms, e.event_type)))
    state.update(s1.copy(pending = pending))
    if (pending.nonEmpty)
      // all pending ts are > wm, so this is a valid (future) timeout
      state.setTimeoutTimestamp(pending.map(_.ts_ms).min)
    hits.reverseIterator
  }

  /** Streaming funnel: requires a watermark on the source's
    * event-time column mapped into `ts_ms` upstream (same contract
    * as [[Sessionize]]). */
  def apply(events: Dataset[Event]): Dataset[Hit] = {
    implicit val he = Encoders.product[Hit]
    implicit val se = Encoders.product[State]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout())(updateState)
  }
}
