package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamSessionize
import graft.streaming.StreamSessionize.{Session, UserEvent}

/** Streaming sessionization: gap-rule parity with the batch
  * q_sessionize arithmetic, roll-closure vs timeout-closure, per-user
  * state isolation, and cross-batch session continuation. */
class StreamSessionizeSpec extends SparkSpec {

  private val t0 = 1700000000L
  private def ts(off: Long) = new Timestamp((t0 + off) * 1000)

  test("gap rule closes on roll and on timeout; sessions continue across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[UserEvent]
    val out = StreamSessionize.sessions(
      input.toDS(), gapSec = 60L, watermarkDelay = "5 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 opens a session (two events 30 s apart, within
      // gap); user 2 opens independently; out-of-order within batch
      input.addData(
        UserEvent(1L, 11L, ts(30)),
        UserEvent(1L, 10L, ts(0)),
        UserEvent(2L, 20L, ts(5)))
      q.processAllAvailable()
      // batch 2: user 1's event at t=150 is 120 s after the session end
      // (> gap 60) → rolls the session, which must be emitted NOW even
      // though no timeout has fired
      input.addData(UserEvent(1L, 12L, ts(150)))
      q.processAllAvailable()
      // batch 2 advanced the watermark to t+145, past both users'
      // seal points (end+gap = t+90 and t+65) — the follow-up no-data
      // batch processAllAvailable runs must emit both sealed sessions,
      // while user 1's new session (seal point t+210) stays in state
      val afterRoll = spark.table("sess_out").as[Session].collect()
      assert(afterRoll.toSet === Set(
        Session(1L, t0, t0 + 30, 2L),
        Session(2L, t0 + 5, t0 + 5, 1L)),
        s"sealed-session emission wrong: ${afterRoll.mkString(",")}")

      // batch 3: a heartbeat far in the future advances the watermark
      // past every open session's end + gap → both time out
      input.addData(UserEvent(9L, 90L, ts(1000)))
      q.processAllAvailable()
      // one more advance so user 9's own session can time out too
      input.addData(UserEvent(8L, 80L, ts(2000)))
      q.processAllAvailable()

      val sessions = spark.table("sess_out").as[Session].collect().toSet
      assert(sessions.contains(Session(1L, t0, t0 + 30, 2L)))
      assert(sessions.contains(Session(1L, t0 + 150, t0 + 150, 1L)),
        "rolled-open session must close by timeout")
      assert(sessions.contains(Session(2L, t0 + 5, t0 + 5, 1L)),
        "independent user closes by timeout")
      assert(sessions.contains(Session(9L, t0 + 1000, t0 + 1000, 1L)))
    } finally q.stop()
  }

  test("within-gap events across batches extend one session, count exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[UserEvent]
    val out = StreamSessionize.sessions(
      input.toDS(), gapSec = 100L, watermarkDelay = "5 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out2")
      .outputMode("append").start()
    try {
      input.addData(UserEvent(5L, 1L, ts(0)))
      q.processAllAvailable()
      input.addData(UserEvent(5L, 2L, ts(80)))
      q.processAllAvailable()
      input.addData(UserEvent(5L, 3L, ts(160)))
      q.processAllAvailable()
      // advance the watermark far enough to close it (end 160 + gap 100
      // + delay 5 < 1000)
      input.addData(UserEvent(6L, 9L, ts(1000)))
      q.processAllAvailable()
      val sessions = spark.table("sess_out2").as[Session].collect().toSet
      assert(sessions.contains(Session(5L, t0, t0 + 160, 3L)),
        s"cross-batch continuation wrong: ${sessions.mkString(",")}")
    } finally q.stop()
  }

  test("admissible late event bridges two rolled sessions into one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // gap 60, delay 55: after t=100 and t=200 arrive the user holds TWO
    // unsealed sessions; t=150 is still admissible (watermark 145) and
    // is within gap of both — batch semantics demand ONE [100,200]
    // session of 3 events, which eager roll-emission could never produce
    val input = MemoryStream[UserEvent]
    val out = StreamSessionize.sessions(
      input.toDS(), gapSec = 60L, watermarkDelay = "55 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out3")
      .outputMode("append").start()
    try {
      input.addData(UserEvent(7L, 1L, ts(100)))
      q.processAllAvailable()
      input.addData(UserEvent(7L, 2L, ts(200)))
      q.processAllAvailable()
      input.addData(UserEvent(7L, 3L, ts(150)))
      q.processAllAvailable()
      input.addData(UserEvent(6L, 9L, ts(2000)))
      q.processAllAvailable()
      val sessions = spark.table("sess_out3").as[Session].collect()
        .filter(_.user_id == 7L)
      assert(sessions.toSeq === Seq(Session(7L, t0 + 100, t0 + 200, 3L)),
        s"bridge wrong: ${sessions.mkString(",")}")
    } finally q.stop()
  }

  test("mid-second watermark does not seal early: sub-second straggler still joins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // gap 60, delay 55, millisecond stamps: a heartbeat at 215.5 s puts
    // the watermark at 160500 ms. Seconds truncate, so an admissible
    // event at 160.9 s is second 160 — still within gap of the session
    // ending at 100. A (end+gap)*1000 < wm seal would have emitted
    // [100,100] before the straggler; the truncation-aware seal holds
    // it open and the straggler merges, matching batch semantics.
    def tsMs(offMs: Long) = new Timestamp(t0 * 1000 + offMs)
    val input = MemoryStream[UserEvent]
    val out = StreamSessionize.sessions(
      input.toDS(), gapSec = 60L, watermarkDelay = "55 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out5")
      .outputMode("append").start()
    try {
      input.addData(UserEvent(11L, 1L, tsMs(100000)))
      q.processAllAvailable()
      input.addData(UserEvent(12L, 2L, tsMs(215500)))
      q.processAllAvailable()
      input.addData(UserEvent(11L, 3L, tsMs(160900)))
      q.processAllAvailable()
      input.addData(UserEvent(13L, 9L, tsMs(2000000)))
      q.processAllAvailable()
      val sessions = spark.table("sess_out5").as[Session].collect()
        .filter(_.user_id == 11L)
      assert(sessions.toSeq === Seq(Session(11L, t0 + 100, t0 + 160, 2L)),
        s"early seal: ${sessions.mkString(",")}")
    } finally q.stop()
  }

  test("an out-of-order event beyond the gap forms its own earlier session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // gap 5, delay 60: t=991 arrives after t=1000 and is 9 s before it
    // — beyond the gap, so it must NOT stretch the session backwards
    val input = MemoryStream[UserEvent]
    val out = StreamSessionize.sessions(
      input.toDS(), gapSec = 5L, watermarkDelay = "60 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out4")
      .outputMode("append").start()
    try {
      input.addData(UserEvent(3L, 1L, ts(1000)))
      q.processAllAvailable()
      input.addData(UserEvent(3L, 2L, ts(991)))
      q.processAllAvailable()
      input.addData(UserEvent(6L, 9L, ts(3000)))
      q.processAllAvailable()
      val sessions = spark.table("sess_out4").as[Session].collect()
        .filter(_.user_id == 3L).sortBy(_.session_start)
      assert(sessions.toSeq === Seq(
        Session(3L, t0 + 991, t0 + 991, 1L),
        Session(3L, t0 + 1000, t0 + 1000, 1L)),
        s"backward stretch: ${sessions.mkString(",")}")
    } finally q.stop()
  }
}
