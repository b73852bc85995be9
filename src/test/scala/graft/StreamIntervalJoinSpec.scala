package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamIntervalJoin
import graft.streaming.StreamIntervalJoin.{Click, Impression}

/** Stream-stream event-time interval join: batch row-set parity
  * across arbitrary micro-batch arrival, multi-match fan-out, window
  * boundary inclusivity, and the watermark dropping a too-late
  * impression that batch WOULD have matched. */
class StreamIntervalJoinSpec extends SparkSpec {

  private val t0 = 1700000040L
  private def ts(off: Long) = new Timestamp((t0 + off) * 1000)

  private def runStream(
      impBatches: Seq[Seq[Impression]],
      clickBatches: Seq[Seq[Click]]): Set[(Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val q = StreamIntervalJoin.attribute(
        imps.toDS(), clicks.toDS(), windowSec = 60, watermarkSec = 30)
      .writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      impBatches.zipAll(clickBatches, Seq.empty[Impression], Seq.empty[Click])
        .foreach { case (ib, cb) =>
          if (ib.nonEmpty) imps.addData(ib: _*)
          if (cb.nonEmpty) clicks.addData(cb: _*)
          q.processAllAvailable()
        }
      spark.table("ij").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally { q.stop() }
  }

  test("interval join: stream equals batch across micro-batch arrival; boundaries inclusive") {
    import spark.implicits._
    // u1: imp 1 @t0+0, imp 2 @t0+50; clicks @t0+10 (matches 1),
    // @t0+60 (matches BOTH: 60-0=60 is exactly the window — inclusive
    // — and 60-50=10), @t0+105 (matches 2 only: 105-0 > 60 rules imp
    // 1 out, 105-50=55 is in)
    val imps = Seq(
      Impression(1L, "u1", ts(0)), Impression(2L, "u1", ts(50)),
      Impression(3L, "u2", ts(5)))
    val clicks = Seq(
      Click(10L, "u1", ts(10)), Click(11L, "u1", ts(60)),
      Click(12L, "u1", ts(105)), Click(13L, "u2", ts(4)), // before imp 3
      Click(14L, "u3", ts(8)))                            // no impression
    val expected = Set((10L, 1L), (11L, 1L), (11L, 2L), (12L, 2L))
    // batch parity through the same function
    val batch = StreamIntervalJoin.attribute(
        imps.toDS(), clicks.toDS(), windowSec = 60, watermarkSec = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === expected)
    // stream: impressions and clicks arrive interleaved across batches
    val got = runStream(
      Seq(Seq(imps(0), imps(2)), Seq(imps(1)), Seq.empty),
      Seq(Seq(clicks(3)), Seq(clicks(0), clicks(4)),
        Seq(clicks(1), clicks(2))))
    assert(got === expected)
  }

  test("left-outer interval join: unmatched impressions emit null ONLY after the watermark seals their window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val q = StreamIntervalJoin.attributeOuter(
        imps.toDS(), clicks.toDS(), windowSec = 60, watermarkSec = 30)
      .writeStream.format("memory").queryName("oj")
      .outputMode("append").start()
    def rows() = spark.table("oj").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1))).toSet
    try {
      // imp 1 (u1) gets a click; imp 2 (u2) never does
      imps.addData(Impression(1L, "u1", ts(0)), Impression(2L, "u2", ts(5)))
      clicks.addData(Click(10L, "u1", ts(10)))
      q.processAllAvailable()
      assert(rows() === Set((Some(10L), 1L)),
        "the unmatched impression must NOT emit while its window is open")
      // advance BOTH sides far past imp 2's window [5, 65] — the
      // GLOBAL watermark is the MIN across all inputs, so a closer on
      // the click stream alone would leave it pinned at the impression
      // side's last advance and the null row would never emit. The
      // null-extended row then surfaces in the state-cleanup batch
      // that follows the advance, so push two closing batches.
      imps.addData(Impression(99L, "u99", ts(900)))
      clicks.addData(Click(90L, "u9", ts(900)))
      q.processAllAvailable()
      clicks.addData(Click(91L, "u8", ts(901)))
      q.processAllAvailable()
      assert(rows() === Set((Some(10L), 1L), (None, 2L)),
        "sealed unmatched impression emits exactly once, null-extended; " +
          "the UNSEALED closer impression (window still open) is withheld")
    } finally { q.stop() }
    // batch parity on the sealed universe; batch ALSO emits the closer
    // impression's null row because batch has no notion of "still
    // open" — that one row is exactly the stream/batch difference,
    // and it is the difference by DESIGN (the stream may yet match it)
    val batch = StreamIntervalJoin.attributeOuter(
        Seq(Impression(1L, "u1", ts(0)), Impression(2L, "u2", ts(5)),
          Impression(99L, "u99", ts(900))).toDS(),
        Seq(Click(10L, "u1", ts(10)), Click(90L, "u9", ts(900)),
          Click(91L, "u8", ts(901))).toDS(),
        windowSec = 60, watermarkSec = 30)
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1))).toSet
    assert(batch === Set((Some(10L), 1L), (None, 2L), (None, 99L)))
  }

  test("interval join: an impression arriving past the watermark is dropped, not matched") {
    import spark.implicits._
    // batch 1 advances both watermarks far ahead; the impression then
    // arrives 'before' the clicks in event time but past the watermark
    val lateImp = Impression(9L, "u9", ts(10))
    val onTimeClick = Click(90L, "u9", ts(20))
    val got = runStream(
      Seq(Seq(Impression(1L, "u0", ts(500))), Seq(lateImp)),
      Seq(Seq(Click(50L, "u0", ts(501)), onTimeClick), Seq.empty))
    assert(got === Set((50L, 1L)),
      "late impression must not match; batch would have matched it")
    // contrast: batch over the same rows DOES match the pair
    val batch = StreamIntervalJoin.attribute(
        Seq(Impression(1L, "u0", ts(500)), lateImp).toDS(),
        Seq(Click(50L, "u0", ts(501)), onTimeClick).toDS(),
        windowSec = 60, watermarkSec = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((50L, 1L), (90L, 9L)))
  }
}
