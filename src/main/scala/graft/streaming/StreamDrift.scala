package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitor — the ingest-time twin of the
  * batch PSI drift audit (graft.operators.Profiling q_psi_drift): per
  * tumbling event-time window, the Population Stability Index of the
  * observed source mix against a pinned baseline share table, emitted
  * ONLY when the watermark seals the window. The monitor a continuous
  * ingest actually runs: a crawl slice going rogue (one host flooding,
  * one source silently dying) moves the source mix long before any
  * content-level quality metric reacts, and PSI is the standard
  * actuarial drift number for exactly that readout.
  *
  * Emission contract (Append semantics, the [[StreamSessionize]]
  * rule): a window's rows emit exactly once, when the event-time
  * timeout fires at window_end + allowed lateness — admissible late
  * arrivals up to the watermark still land in their window's state;
  * emitting per-batch running values would publish PSI numbers that a
  * late event could silently invalidate.
  *
  * Float contract: the PSI terms use the pinned-double rule of the
  * batch family (one ln per source, floored to micros BEFORE
  * summation); shares clamp at 1 ppm so a source absent from one side
  * contributes a large-but-finite term instead of ±∞ (stated
  * contract, mirrored in the spec's replica).
  *
  * Shape: ONE `flatMapGroupsWithState` keyed by window start; state is
  * the per-source count map — bounded by |sources| per open window,
  * and the number of open windows is bounded by lateness/windowSec.
  * The keyed shuffle carries (window, source-count delta) pairs only:
  * the per-batch fold pre-aggregates the iterator in one pass, so a
  * burst costs no buffering (the StreamDedup hot-key contract).
  */
object StreamDrift {

  case class DocEv(source: String, ts: Timestamp)
  case class Drift(window_start: Long, source: String, n: Long,
                   share_ppm: Long, baseline_ppm: Long, term_micro: Long,
                   psi_micro: Long, drifted: Boolean)
  private[streaming] case class DriftState(counts: Map[String, Long])

  /** Floored-micro PSI term for one source: (p−q)·ln(p/q) with both
    * shares clamped to ≥ 1 ppm. Shared by the stream and the spec's
    * batch replica — one truth, not two copies. */
  private[graft] def psiTermMicro(obsPpm: Long, basePpm: Long): Long = {
    val p = math.max(obsPpm, 1L).toDouble / 1e6
    val q = math.max(basePpm, 1L).toDouble / 1e6
    math.floor(1e6 * (p - q) * math.log(p / q)).toLong
  }

  /** @param baselinePpm pinned per-source baseline shares (ppm; the
    *                    reference mix the monitor defends)
    * @param psiFlagMicro drift flag threshold — 0.2 (200000 micro) is
    *                     the standard "significant shift" fence */
  def drift(
      events: Dataset[DocEv],
      baselinePpm: Map[String, Long],
      windowSec: Long = 3600L,
      watermarkDelay: String = "10 seconds",
      psiFlagMicro: Long = 200000L): Dataset[Drift] = {
    val s = events.sparkSession
    import s.implicits._
    val base = s.sparkContext.broadcast(baselinePpm)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.ts.getTime / 1000 / windowSec) * windowSec)
      .flatMapGroupsWithState[DriftState, Drift](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (winStart: Long, evs: Iterator[DocEv], st: GroupState[DriftState]) =>
          if (st.hasTimedOut) {
            val counts = st.getOption.map(_.counts).getOrElse(Map.empty)
            st.remove()
            val total = counts.valuesIterator.sum
            if (total == 0L) Iterator.empty
            else {
              val bl = base.value
              // every source on EITHER side contributes a term — a
              // vanished baseline source is drift too
              val srcs = (counts.keySet ++ bl.keySet).toSeq.sorted
              val rows = srcs.map { src =>
                val n = counts.getOrElse(src, 0L)
                val ppm = n * 1000000L / total
                val bppm = bl.getOrElse(src, 0L)
                (src, n, ppm, bppm, psiTermMicro(ppm, bppm))
              }
              val psi = rows.map(_._5).sum
              rows.iterator.map { case (src, n, ppm, bppm, term) =>
                Drift(winStart, src, n, ppm, bppm, term, psi,
                  psi >= psiFlagMicro)
              }
            }
          } else {
            // one-pass pre-aggregation of the batch's arrivals
            val delta = scala.collection.mutable.Map.empty[String, Long]
            evs.foreach(e => delta.update(e.source,
              delta.getOrElse(e.source, 0L) + 1L))
            val merged = st.getOption.map(_.counts).getOrElse(Map.empty)
            val counts = delta.foldLeft(merged) { case (m, (k, v)) =>
              m.updated(k, m.getOrElse(k, 0L) + v)
            }
            st.update(DriftState(counts))
            // seal when the watermark passes the window end
            st.setTimeoutTimestamp((winStart + windowSec) * 1000L)
            Iterator.empty
          }
      }
  }
}
