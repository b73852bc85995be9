package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC application — the ingest-time half of
  * [[graft.operators.Sequences.qCdcApply]]'s batch MERGE semantics: a
  * change stream keyed by entity id folds into a current-snapshot
  * state, and every micro-batch that touches an entity emits its
  * refreshed snapshot (Update mode — the sink upserts by key, the
  * Delta/Hudi/Iceberg merge pattern).
  *
  * Out-of-order safety WITHOUT a watermark: the "last operation" and
  * "last upsert" picks are running (event-time, event_id) MAXIMA, so
  * an event arriving late, replayed, or across any batch boundary
  * folds to exactly the state the batch query computes over the same
  * rows — arrival order is irrelevant by construction (spec feeds the
  * fixture stream in two scrambled halves and pins equality against
  * the batch operator). No timeout: the snapshot IS the product, so
  * state is O(#entities) — the CDC consumer's inherent floor — and at
  * cluster scale it shuffles as fixed-width rows keyed by entity id.
  *
  * Micro-batch hot-key behavior mirrors [[StreamDedup]]: one pass
  * over the group iterator, O(1) memory per key however many events a
  * batch lands on one entity.
  */
object StreamCdc {

  case class CdcEvent(user_id: Long, event_id: Long, event_type: String,
                      ts: Timestamp, value_cents: Long)
  private[streaming] case class CdcState(
      nOps: Long, lastTsUs: Long, lastId: Long, lastOp: String,
      upTsUs: Long, upId: Long, upCents: Long, hasUp: Boolean)
  case class CdcSnapshot(user_id: Long, n_ops: Long, last_op: String,
                         last_ts_us: Long, current_cents: Long, alive: Long)

  /** Microsecond event time from a JVM Timestamp: ms epoch + the
    * sub-ms microseconds carried in nanos (parquet timestamps are
    * us-precision; dropping them would diverge from the batch twin
    * exactly once per sub-ms tie). */
  private[graft] def epochUs(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  def applyChanges(events: Dataset[CdcEvent]): Dataset[CdcSnapshot] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[CdcEvent], st: GroupState[CdcState]) => {
          var cur = st.getOption.getOrElse(CdcState(
            0L, Long.MinValue, Long.MinValue, null,
            Long.MinValue, Long.MinValue, 0L, hasUp = false))
          var touched = false
          rows.foreach { e =>
            touched = true
            val t = epochUs(e.ts)
            cur = cur.copy(nOps = cur.nOps + 1)
            if (t > cur.lastTsUs || (t == cur.lastTsUs && e.event_id > cur.lastId))
              cur = cur.copy(lastTsUs = t, lastId = e.event_id,
                lastOp = e.event_type)
            if (e.event_type != "error" &&
                (t > cur.upTsUs || (t == cur.upTsUs && e.event_id > cur.upId)))
              cur = cur.copy(upTsUs = t, upId = e.event_id,
                upCents = e.value_cents, hasUp = true)
          }
          if (!touched) Iterator.empty
          else {
            st.update(cur)
            Iterator.single(CdcSnapshot(uid, cur.nOps, cur.lastOp,
              cur.lastTsUs,
              if (cur.hasUp) cur.upCents else 0L,
              if (cur.lastOp == "error") 0L else 1L))
          }
        })
  }
}
