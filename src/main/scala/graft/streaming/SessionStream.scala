package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the streaming twin of
  * `TimeSeries.sessionize` (batch, q38), built on
  * `flatMapGroupsWithState` with event-time timeout.
  *
  * State per key = the open session (start, last-seen, aggregates). A
  * session closes and is EMITTED when either (a) a new event for the
  * key arrives after more than `gapMinutes` of event time, or (b) the
  * watermark passes last-seen + gap (timeout fires with no newer
  * event). Exactly the reference-free semantics a 100 TB event stream
  * needs: state is per-key constant-size, the shuffle is one hash
  * exchange on the key, and late events beyond the watermark are
  * dropped by the engine before they reach the state function.
  */
object SessionStream {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  case class SessionState(start: Long, lastSeen: Long, nEvents: Long, total: Double)

  case class ClosedSession(user_id: Long, start: Timestamp, end: Timestamp,
                           n_events: Long, total: Double)

  def sessionize(events: Dataset[Event], gapMinutes: Int,
                 watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    val gapMs = gapMinutes * 60L * 1000L
    implicit val longEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, new Timestamp(s.start),
              new Timestamp(s.lastSeen), s.nEvents, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen > gapMs =>
                  closed ::= ClosedSession(user, new Timestamp(s.start),
                    new Timestamp(s.lastSeen), s.nEvents, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1, total = s.total + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.reverseIterator
          }
        })
  }
}
