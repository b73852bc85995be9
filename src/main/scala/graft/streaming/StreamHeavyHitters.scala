package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the ingest-time twin of the batch top-k
  * sketch aggregate (functions/TopKLongsAgg.scala): which keys dominate
  * the stream RIGHT NOW, with bounded state, without waiting for a
  * batch rollup. The pipeline uses: hot-host throttling during a
  * crawl, template-burst detection during ingest dedup, and skew
  * alerts before a hot key melts a downstream shuffle.
  *
  * Algorithm: SpaceSaving (Metwally et al. 2005) per key-space shard —
  * at most `capacity` counters per shard; an unseen key evicts the
  * minimum counter and INHERITS its count (recorded as the entry's
  * overestimate bound `err`). Guarantees, independent of arrival
  * order: every key with true count > N_shard/capacity is present,
  * `cnt − err ≤ true ≤ cnt`, and while a shard has seen ≤ capacity
  * distinct keys its counts are EXACT (err = 0) — the regime the
  * parity spec pins against a batch groupBy.
  *
  * Shape: ONE `flatMapGroupsWithState` keyed by a deterministic hash
  * shard of the key space (shards = parallelism knob; the keyed state
  * store shuffles (shard, table) pairs only), O(capacity) state per
  * shard enforced by construction, Update-mode emission of each
  * shard's current table per micro-batch. Merging shard tables is
  * exact because shards partition the key space — no cross-shard key
  * ever splits its count. Within a batch the iterator is folded in
  * ONE pass with O(capacity) memory — a hot-key burst of 10⁶ rows in
  * one batch costs no buffering (the StreamDedup hot-signature
  * contract).
  */
object StreamHeavyHitters {

  case class Ev(key: String, ts: Timestamp)
  case class HH(shard: Int, key: String, cnt: Long, err: Long)
  private[streaming] case class SsState(
      keys: Array[String], cnts: Array[Long], errs: Array[Long])

  /** Deterministic shard of a key (Java String.hashCode is specified,
    * so replay and the spec's replica agree). */
  def shardOf(key: String, nShards: Int): Int =
    math.floorMod(key.hashCode, nShards)

  /** One SpaceSaving update of the in-memory table. */
  private def update(
      tbl: scala.collection.mutable.LinkedHashMap[String, (Long, Long)],
      key: String, capacity: Int): Unit = {
    tbl.get(key) match {
      case Some((c, e)) => tbl.update(key, (c + 1, e))
      case None if tbl.size < capacity => tbl.update(key, (1L, 0L))
      case None =>
        // evict the min-count entry (ties: lexicographically smallest
        // key — deterministic under replay); inherit its count as the
        // overestimate bound
        val (mk, (mc, _)) = tbl.minBy { case (k, (c, _)) => (c, k) }
        tbl.remove(mk)
        tbl.update(key, (mc + 1, mc))
    }
  }

  def heavyHitters(
      evs: Dataset[Ev], capacity: Int, nShards: Int): Dataset[HH] = {
    val s = evs.sparkSession
    import s.implicits._
    evs
      .groupByKey(e => shardOf(e.key, nShards))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[Ev], st: GroupState[SsState]) => {
          val tbl = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
          st.getOption.foreach { p =>
            var i = 0
            while (i < p.keys.length) {
              tbl.update(p.keys(i), (p.cnts(i), p.errs(i))); i += 1
            }
          }
          rows.foreach(e => update(tbl, e.key, capacity))
          val snap = tbl.toArray
          st.update(SsState(snap.map(_._1), snap.map(_._2._1), snap.map(_._2._2)))
          snap.iterator.map { case (k, (c, e)) => HH(shard, k, c, e) }
        })
  }
}
