package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamDrift
import graft.streaming.StreamDrift.{DocEv, Drift}

/** Streaming PSI drift monitor: sealed-window emission (nothing before
  * the watermark passes window end), PSI parity with a batch replica
  * built on the SAME shared term function, the vanished-source rule,
  * and the drift flag threshold. */
class StreamDriftSpec extends SparkSpec {

  private val t0 = 1700000000L // window-aligned for windowSec = 100
  private def ts(off: Long) = new Timestamp((t0 + off) * 1000)

  private val baseline = Map("sa" -> 500000L, "sb" -> 500000L)

  private def run(batches: Seq[Seq[DocEv]], name: String): Seq[Drift] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEv]
    val q = StreamDrift.drift(input.toDS(), baseline, windowSec = 100L,
        watermarkDelay = "5 seconds", psiFlagMicro = 200000L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Drift].collect().toSeq
    } finally { q.stop() }
  }

  test("window matching the baseline seals with PSI ~ 0 and no flag") {
    // 5 of each source in window [t0, t0+100); a later event advances
    // the watermark past the seal point
    val w1 = (0 until 5).flatMap(i =>
      Seq(DocEv("sa", ts(i)), DocEv("sb", ts(i))))
    val got = run(Seq(w1, Seq(DocEv("sa", ts(300)))), "drift_flat")
    val sealedW = got.filter(_.window_start == t0)
    assert(sealedW.map(_.source).sorted === Seq("sa", "sb"))
    sealedW.foreach { r =>
      assert(r.n === 5L && r.share_ppm === 500000L)
      assert(r.term_micro === 0L, "identical shares contribute zero")
      assert(r.psi_micro === 0L && !r.drifted)
    }
  }

  test("skewed window flags; PSI equals the batch replica on shared terms") {
    // 9 sa vs 1 sb against a 50/50 baseline
    val w1 = (0 until 9).map(i => DocEv("sa", ts(i))) :+ DocEv("sb", ts(9))
    val got = run(Seq(w1, Seq(DocEv("sa", ts(300)))), "drift_skew")
    val sealedW = got.filter(_.window_start == t0)
    assert(sealedW.length === 2)
    val expTerms = Map(
      "sa" -> StreamDrift.psiTermMicro(900000L, 500000L),
      "sb" -> StreamDrift.psiTermMicro(100000L, 500000L))
    val expPsi = expTerms.values.sum
    sealedW.foreach { r =>
      assert(r.term_micro === expTerms(r.source), r.source)
      assert(r.psi_micro === expPsi)
      assert(r.drifted, "0.47 PSI is far over the 0.2 fence")
    }
    assert(expPsi > 200000L)
  }

  test("nothing emits while the window is open; late arrivals still count") {
    import org.apache.spark.sql.functions.col
    // batch 1 opens the window; no closer event yet -> no output
    val w1 = Seq(DocEv("sa", ts(0)), DocEv("sb", ts(1)))
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEv]
    val q = StreamDrift.drift(input.toDS(), baseline, windowSec = 100L,
        watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName("drift_open")
      .outputMode("append").start()
    try {
      input.addData(w1: _*); q.processAllAvailable()
      assert(spark.table("drift_open").count() === 0L,
        "open window must not emit")
      // a late-but-admissible event lands in the same window (wm is
      // still behind t0+100), then a far-future event seals it
      input.addData(DocEv("sa", ts(50))); q.processAllAvailable()
      assert(spark.table("drift_open").count() === 0L)
      input.addData(DocEv("sa", ts(500))); q.processAllAvailable()
      val sealedRows = spark.table("drift_open")
        .filter(col("window_start") === t0).as[Drift].collect()
      assert(sealedRows.map(r => r.source -> r.n).toMap ===
        Map("sa" -> 2L, "sb" -> 1L), "the late event counted")
    } finally { q.stop() }
  }

  test("a baseline source absent from the window still contributes drift") {
    val w1 = (0 until 10).map(i => DocEv("sa", ts(i))) // sb vanished
    val got = run(Seq(w1, Seq(DocEv("sa", ts(300)))), "drift_gone")
    val sealedW = got.filter(_.window_start == t0)
    assert(sealedW.map(_.source).sorted === Seq("sa", "sb"))
    val sb = sealedW.find(_.source == "sb").get
    assert(sb.n === 0L && sb.share_ppm === 0L && sb.baseline_ppm === 500000L)
    // clamped at 1 ppm, not dropped and not infinite
    assert(sb.term_micro === StreamDrift.psiTermMicro(0L, 500000L))
    assert(sb.term_micro > 0L && sealedW.head.drifted)
  }
}
