package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-time sessionization — the ingest-time twin of the
  * batch `q_sessionize` gap rule (graft.operators.Reports): consecutive
  * events of a user belong to one session while the gap between them
  * stays within `gapSec`; a quiet gap closes the session. Batch
  * recomputes this nightly over the whole table; the stream closes
  * sessions continuously, which is what funnels/abuse monitors consume.
  *
  * Emission contract (Append mode): a session is emitted ONLY once the
  * watermark has sealed its trailing gap — `end + gap < watermark` —
  * because until then an admissible late event could still land inside
  * the gap and bridge it (emitting eagerly on roll-over would make the
  * output diverge from the batch semantics exactly in that case).
  * Unsealed sessions, including ones a newer event has already rolled
  * past, stay in state; late events within the watermark merge into
  * them — possibly bridging two sessions into one — with the same
  * strictly-greater-than gap arithmetic the batch rule uses.
  *
  * Shape: ONE `flatMapGroupsWithState` keyed by user whose state is the
  * ascending vector of unsealed sessions. Unsealed ends span at most a
  * (watermarkDelay + gap)-wide window and are pairwise separated by
  * more than gap, so the vector holds at most
  * floor(watermarkDelay / gap) + 2 sessions — O(1) for any fixed
  * configuration — and total state is bounded by the number of
  * concurrently-active users, never by history. The event-time timeout
  * is registered at the earliest unsealed seal point, so quiet users
  * drain without new arrivals.
  */
object StreamSessionize {

  case class UserEvent(user_id: Long, event_id: Long, ts: Timestamp)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
                     n_events: Long)
  private[streaming] case class OpenSession(startSec: Long, endSec: Long, n: Long)
  private[streaming] case class SessState(sessions: Vector[OpenSession])

  def sessions(
      events: Dataset[UserEvent],
      gapSec: Long = 604800L,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    val s = events.sparkSession
    import s.implicits._

    // merge one event into the ascending, pairwise-gap-separated
    // session vector: the event joins every session it is within gap
    // of (at most its two neighbors — bridging them into one), else
    // opens its own
    def addEvent(ss: Vector[OpenSession], sec: Long): Vector[OpenSession] = {
      val (before, rest) = ss.span(_.endSec < sec - gapSec)
      val (touch, after) = rest.span(_.startSec <= sec + gapSec)
      val merged =
        if (touch.isEmpty) OpenSession(sec, sec, 1L)
        else OpenSession(
          math.min(touch.head.startSec, sec),
          math.max(touch.last.endSec, sec),
          touch.map(_.n).sum + 1L)
      (before :+ merged) ++ after
    }

    def drain(user: Long, st: GroupState[SessState],
              newEvents: Iterator[UserEvent]): Iterator[Session] = {
      var ss = st.getOption.map(_.sessions).getOrElse(Vector.empty)
      // no sort: addEvent's insert-and-merge yields the unique maximal
      // gap-separated clustering regardless of insertion order
      newEvents.foreach(e => ss = addEvent(ss, e.ts.getTime / 1000L))
      // sealed = no admissible event can reach the trailing gap any
      // more. Seconds TRUNCATE (getTime / 1000) while the watermark is
      // in ms: the smallest admissible second is floor(wm/1000), so the
      // session is safe only once endSec + gapSec < floor(wm/1000),
      // i.e. (endSec + gapSec + 1) * 1000 <= wm — the tempting
      // (endSec+gapSec)*1000 < wm form seals up to 999 ms early and an
      // admissible sub-second straggler could still join batch-side
      val wmMs = st.getCurrentWatermarkMs()
      val (sealedSs, unsealed) =
        ss.partition(o => (o.endSec + gapSec + 1) * 1000L <= wmMs)
      if (unsealed.isEmpty) st.remove()
      else {
        st.update(SessState(unsealed))
        // earliest unsealed seal point; clamped above the watermark so
        // a backfilled arrival cannot register a timeout behind it
        // (that throws and kills the query)
        val next = (unsealed.map(_.endSec).min + gapSec + 1) * 1000L
        st.setTimeoutTimestamp(math.max(next, wmMs + 1))
      }
      sealedSs.iterator.map(o => Session(user, o.startSec, o.endSec, o.n))
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[UserEvent], st: GroupState[SessState]) =>
          drain(user, st, if (st.hasTimedOut) Iterator.empty else rows))
  }
}
