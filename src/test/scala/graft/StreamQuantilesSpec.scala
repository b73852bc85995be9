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
}
