package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming seasonal-anomaly monitor — the ingest-time twin of the
  * batch (weekday, hour)-profile z² audit
  * (graft.operators.Sequences q_hourly_anomaly): each hourly event
  * count is judged, WHEN THE WATERMARK SEALS ITS BUCKET, against the
  * running profile of previously-sealed buckets in the same
  * (weekday, hour) cell. The on-call monitor shape: "is this hour's
  * volume weird FOR a Tuesday 3am" — judged online, against only the
  * past (no peeking at future buckets, which the batch full-profile
  * audit is allowed to do; stated contract difference).
  *
  * Emission contract (Append, the [[StreamDrift]] rule): a bucket
  * emits exactly once, when the event-time timeout fires past its
  * end + allowed lateness; admissible late events still land in
  * their bucket's open count. Buckets sealed before the profile has
  * ≥ 4 cells or with zero variance emit the −1 sentinel instead of a
  * z² (a constant or near-empty profile has no scale to judge
  * against — the batch operator's `n >= 4 AND var > 0` fence,
  * surfaced instead of suppressed so the monitor's warm-up is
  * visible).
  *
  * Integer contract: z²_milli = (n·c − s)²·1000 / (n·Σc² − s²) —
  * the batch formula verbatim; interiors use Math.multiplyExact /
  * addExact so an overflow is LOUD (the batch side rides
  * DECIMAL(38,0); per-hour counts past ~3×10⁹ would need the same
  * widening here, stated).
  *
  * Shape: ONE `flatMapGroupsWithState` keyed by the (weekday, hour)
  * cell — at most 168 keys, each holding a 3-long profile plus the
  * map of OPEN buckets (bounded by lateness/3600 + 1). The keyed
  * shuffle carries per-batch (cell, bucket-count delta) pairs only
  * (one-pass pre-aggregation, the StreamDedup hot-key contract).
  * Profile state is the monitor's value and is never removed; it is
  * bounded by the 168-cell key space.
  */
object StreamAnomaly {

  case class Ev(ts: Timestamp)
  case class Anom(hour_bucket: Long, dow: Long, hour_of_day: Long,
                  n_events: Long, cell_buckets: Long, z2_milli: Long)
  private[streaming] case class CellState(
      n: Long, s: Long, s2: Long, open: Map[Long, Long])

  /** Exact z²·1000 of count c against profile (n, s, s2); −1 when the
    * profile is too small (< 4 buckets) or has no variance. Shared by
    * the stream and the spec's replica — one truth, not two copies. */
  private[graft] def z2Milli(n: Long, s: Long, s2: Long, c: Long): Long = {
    if (n < 4) return -1L
    val varN = Math.subtractExact(Math.multiplyExact(n, s2),
      Math.multiplyExact(s, s))
    if (varN <= 0L) return -1L
    val dev = Math.subtractExact(Math.multiplyExact(n, c), s)
    Math.multiplyExact(Math.multiplyExact(dev, dev), 1000L) / varN
  }

  def anomalies(
      events: Dataset[Ev],
      watermarkDelay: String = "10 seconds"): Dataset[Anom] = {
    val s = events.sparkSession
    import s.implicits._

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey { e =>
        val hb = e.ts.getTime / 1000 / 3600
        ((hb / 24 + 4) % 7, hb % 24)
      }
      .flatMapGroupsWithState[CellState, Anom](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (cell: (Long, Long), evs: Iterator[Ev], st: GroupState[CellState]) =>
          val prev = st.getOption.getOrElse(CellState(0L, 0L, 0L, Map.empty))
          // one-pass pre-aggregation of this batch's arrivals
          val delta = scala.collection.mutable.Map.empty[Long, Long]
          evs.foreach { e =>
            val hb = e.ts.getTime / 1000 / 3600
            delta.update(hb, delta.getOrElse(hb, 0L) + 1L)
          }
          val open = delta.foldLeft(prev.open) { case (m, (hb, c)) =>
            m.updated(hb, m.getOrElse(hb, 0L) + c)
          }
          // seal, in bucket order, every open bucket whose end (+0,
          // lateness rides the watermark itself) has passed
          val wm = st.getCurrentWatermarkMs()
          val (sealedHbs, stillOpen) =
            open.keys.toSeq.sorted.partition(hb => (hb + 1) * 3600000L <= wm)
          var (n, sm, s2) = (prev.n, prev.s, prev.s2)
          val out = sealedHbs.map { hb =>
            val c = open(hb)
            val row = Anom(hb, (hb / 24 + 4) % 7, hb % 24, c, n,
              z2Milli(n, sm, s2, c))
            n += 1
            sm = Math.addExact(sm, c)
            s2 = Math.addExact(s2, Math.multiplyExact(c, c))
            row
          }
          val openMap = stillOpen.map(hb => hb -> open(hb)).toMap
          st.update(CellState(n, sm, s2, openMap))
          if (openMap.nonEmpty) {
            // earliest open bucket's end; clamped above the watermark
            // (a late re-opened bucket's end may already be behind it)
            val next = (openMap.keys.min + 1) * 3600000L
            st.setTimeoutTimestamp(math.max(next, wm + 1L))
          }
          out.iterator
      }
  }
}
