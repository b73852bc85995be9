package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamQuantiles
import graft.streaming.StreamQuantiles.Metric

/** Streaming windowed KLL quantiles: exact-regime (n ≤ k) parity with
  * the identical batch aggregate, watermark-closed append emission,
  * cross-batch accumulation into one window, and late-past-watermark
  * drops. */
class StreamQuantilesSpec extends SparkSpec {

  // tumbling windows align to the epoch: t0 must be a multiple of the
  // 60 s window or the fixture rows straddle two windows
  private val t0 = 1700000040L
  private def ts(off: Long) = new Timestamp((t0 + off) * 1000)

  private def runStream(batches: Seq[Seq[Metric]]): Seq[(Timestamp, Long, Double, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Metric]
    val q = StreamQuantiles.windowQuantiles(input.toDS(), windowSec = 60, watermarkSec = 30)
      .writeStream.format("memory").queryName("wq")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table("wq").collect().map(r =>
        (r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .sortBy(_._1.getTime).toSeq
    } finally { q.stop() }
  }

  test("exact regime: stream windows equal the batch aggregate over the same rows") {
    import spark.implicits._
    // window [t0, t0+60): 1..100 over two micro-batches; window
    // [t0+60, t0+120): 5 values; a third batch far ahead closes both
    // batch 1 advances the watermark to t0+58−30 = t0+28, so batch 2's
    // event times must stay ≥ t0+28 or they'd be (correctly) dropped
    val w1a = (1 to 60).map(i => Metric(ts(i % 59), i.toDouble))
    val w1b = (61 to 100).map(i => Metric(ts(30 + (i % 29)), i.toDouble))
    val w2 = Seq(10.0, 20.0, 30.0, 40.0, 50.0).map(v => Metric(ts(70), v))
    val closer = Seq(Metric(ts(500), 0.0))
    val got = runStream(Seq(w1a, w1b ++ w2, closer))
    // only the two closed windows appended (the closer's window is open)
    assert(got.length === 2, got.mkString(","))
    val batch = StreamQuantiles.windowQuantiles(
        (w1a ++ w1b ++ w2).toDS(), windowSec = 60, watermarkSec = 30)
      .collect().map(r =>
        (r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1.getTime).toSeq
    // n ≤ 200 → the sketch holds every value: stream == batch exactly,
    // regardless of micro-batch boundaries
    assert(got === batch)
    assert(got.head._2 === 100L)
    assert(got.head._3 === 50.0) // inclusive-rank median of 1..100
    assert(got(1)._2 === 5L)
    assert(got(1)._3 === 30.0)
    assert(got(1)._5 === 50.0)
  }

  test("late data past the watermark is dropped from the closed window") {
    val onTime = (1 to 9).map(i => Metric(ts(i), i.toDouble))
    val closer = Seq(Metric(ts(500), 0.0))
    val late = Seq(Metric(ts(5), 1000.0)) // window already closed
    val got = runStream(Seq(onTime, closer, late))
    assert(got.length === 1)
    assert(got.head._2 === 9L, "late row must not reopen the window")
    assert(got.head._5 < 1000.0)
  }

  // --- session_window + KLL composition (gap sessions, mergeable sketch) ---

  import graft.streaming.StreamQuantiles.KeyedMetric

  private def runSessionStream(batches: Seq[Seq[KeyedMetric]])
      : Seq[(String, Timestamp, Timestamp, Long, Double, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedMetric]
    val q = StreamQuantiles.sessionQuantiles(input.toDS(), gapSec = 60, watermarkSec = 30)
      .writeStream.format("memory").queryName("sq")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table("sq").collect().map(r =>
        (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))
        .sortBy(t => (t._1, t._2.getTime)).toSeq
    } finally { q.stop() }
  }

  test("session quantiles: cross-batch merge, batch parity, exact-gap merges and gap+1 splits") {
    import spark.implicits._
    // crawl A: one burst whose events ARRIVE across three micro-batches.
    // Events ts(1..20) sit < 60 s apart → one session; the probe at
    // exactly last + gap (t0+20 + 60 = t0+80) MERGES — Spark coalesces
    // touching session windows (measured 4.1.2; pinned in batch by
    // SequencesSelectionSpec's boundary test) — extending the session
    // to [t0+1, t0+140); the next event at t0+141 (silence of gap + 1)
    // STARTS a new session.
    val a1 = (1 to 10).map(i => KeyedMetric("A", ts(i), i.toDouble))
    val a2 = (11 to 20).map(i => KeyedMetric("A", ts(i), i.toDouble))
    val aBoundary = Seq(KeyedMetric("A", ts(20 + 60), 99.0))
    val aSplit = Seq(KeyedMetric("A", ts(20 + 60 + 61), 55.0))
    // crawl B: independent key, same window of time → its own session
    val b1 = Seq(5.0, 15.0, 25.0).map(v => KeyedMetric("B", ts(7), v))
    val closer = Seq(KeyedMetric("Z", ts(900), 0.0))
    val got = runSessionStream(Seq(a1 ++ b1, a2, aBoundary ++ aSplit, closer))
    // closed sessions: A's merged burst, A's split singleton, B's
    assert(got.length === 3, got.mkString(","))
    val batch = StreamQuantiles.sessionQuantiles(
        (a1 ++ a2 ++ aBoundary ++ aSplit ++ b1).toDS(),
        gapSec = 60, watermarkSec = 30)
      .collect().map(r =>
        (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(t => (t._1, t._2.getTime)).toSeq
    // n ≤ 200 per session → sketches hold every value: stream == batch
    // exactly, regardless of which micro-batch each event arrived in
    assert(got === batch)
    val aMain = got.head
    assert(aMain._1 === "A" && aMain._4 === 21L,
      "micro-batches and the exact-gap probe must merge into one session")
    assert(aMain._2 === ts(1) && aMain._3 === ts(140),
      "merged bounds are [first, merged-last + gap)")
    assert(aMain._5 === 11.0, "inclusive-rank median of {1..20, 99}")
    val aNew = got(1)
    assert(aNew._1 === "A" && aNew._4 === 1L && aNew._5 === 55.0,
      "silence strictly longer than the gap starts a NEW session")
    assert(got(2)._1 === "B" && got(2)._4 === 3L && got(2)._5 === 15.0)
  }
}
