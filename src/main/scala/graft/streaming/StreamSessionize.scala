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
  * Shape: ONE `flatMapGroupsWithState` keyed by user with O(1) state —
  * the single open session (start, end, count) — and an event-time
  * timeout at `end + gap`, so state is bounded by the number of
  * concurrently-active users, never by history. A batch's group rows
  * are folded in ascending event-time order (the group is buffered and
  * sorted: a user's per-trigger volume is human-scale, unlike
  * StreamDedup's hot-signature case which must stay O(1)).
  *
  * Emission contract (Append mode): a session row is emitted the moment
  * it is KNOWN closed — either a newer event rolled the session over
  * the gap, or the watermark passed `end + gap` (timeout). Events later
  * than the watermark delay are dropped by the engine upstream, which
  * is exactly what makes the roll decision safe to emit early: no
  * admissible future event can land inside a gap the watermark has
  * sealed. Same session arithmetic as the batch rule — seconds are
  * truncating epoch-seconds, gap strictly greater-than.
  */
object StreamSessionize {

  case class UserEvent(user_id: Long, event_id: Long, ts: Timestamp)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
                     n_events: Long)
  private[streaming] case class OpenSession(startSec: Long, endSec: Long, n: Long)

  def sessions(
      events: Dataset[UserEvent],
      gapSec: Long = 604800L,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[UserEvent], st: GroupState[OpenSession]) => {
          if (st.hasTimedOut) {
            // watermark passed end + gap: the open session is final
            val open = st.get
            st.remove()
            Iterator.single(Session(user, open.startSec, open.endSec, open.n))
          } else {
            val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var open = st.getOption.orNull
            val closed = Vector.newBuilder[Session]
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000L // truncating, like the batch rule
              if (open == null) open = OpenSession(sec, sec, 1L)
              else if (sec - open.endSec > gapSec) {
                closed += Session(user, open.startSec, open.endSec, open.n)
                open = OpenSession(sec, sec, 1L)
              } else if (sec >= open.endSec) {
                open = OpenSession(open.startSec, sec, open.n + 1L)
              } else {
                // in-batch stragglers inside the open window still count
                open = OpenSession(math.min(open.startSec, sec), open.endSec,
                  open.n + 1L)
              }
            }
            if (open != null) {
              st.update(open)
              // clamp like StreamDedup: a backfilled arrival must not
              // compute a timeout behind the watermark (that throws and
              // kills the query) — it just times out at the next advance
              st.setTimeoutTimestamp(math.max(
                open.endSec * 1000L + gapSec * 1000L,
                st.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
        })
  }
}
