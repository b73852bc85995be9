package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamAnomaly
import graft.streaming.StreamAnomaly.{Anom, Ev}

/** Streaming seasonal-anomaly monitor: sealed-bucket emission, the
  * profile-so-far z² against the shared exact formula, warm-up
  * sentinels, and late-arrival admission. */
class StreamAnomalySpec extends SparkSpec {

  // weekly buckets land in the SAME (dow, hour) profile cell; the
  // hour-aligned base keeps event times clear of the initial
  // watermark's ts=0 boundary (a row AT the watermark is dropped late)
  private val base = 1704067200L
  private def weekTs(week: Int, offSec: Long) =
    new Timestamp((base + week * 168L * 3600L + offSec) * 1000)

  private def run(batches: Seq[Seq[Ev]], name: String): Seq[Anom] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamAnomaly.anomalies(input.toDS(), watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Anom].collect().toSeq
    } finally { q.stop() }
  }

  test("warm-up sentinels, then a 5x spike scores the exact batch z2") {
    // weekly counts 10,12,10,12 then 50 in the same cell; a far-future
    // event seals the spike week
    val batches = Seq(10, 12, 10, 12, 50).zipWithIndex.map { case (c, w) =>
      (0 until c).map(i => Ev(weekTs(w, i)))
    } :+ Seq(Ev(weekTs(9, 0)))
    val got = run(batches, "anom_spike").sortBy(_.hour_bucket)
    assert(got.length === 5)
    assert(got.map(_.n_events) === Seq(10L, 12L, 10L, 12L, 50L))
    assert(got.map(_.cell_buckets) === Seq(0L, 1L, 2L, 3L, 4L))
    // first four seal against a <4-bucket profile: sentinel
    assert(got.take(4).forall(_.z2_milli === -1L))
    // spike: profile n=4 s=44 s2=488 -> (4*50-44)^2*1000/(4*488-44^2)
    val exp = StreamAnomaly.z2Milli(4L, 44L, 488L, 50L)
    assert(exp === 1521000L, "hand arithmetic")
    assert(got.last.z2_milli === exp)
    // every bucket maps to one cell
    assert(got.map(r => (r.dow, r.hour_of_day)).distinct.length === 1)
  }

  test("constant profile has no scale: variance-zero sentinel") {
    val batches = Seq(7, 7, 7, 7, 9).zipWithIndex.map { case (c, w) =>
      (0 until c).map(i => Ev(weekTs(w, i)))
    } :+ Seq(Ev(weekTs(9, 0)))
    val got = run(batches, "anom_flat").sortBy(_.hour_bucket)
    assert(got.length === 5)
    assert(got.forall(_.z2_milli === -1L),
      "all-equal profile must sentinel, not divide by zero")
  }

  test("open buckets do not emit; admissible late events still count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamAnomaly.anomalies(input.toDS(), watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName("anom_open")
      .outputMode("append").start()
    try {
      input.addData((0 until 3).map(i => Ev(weekTs(0, i))): _*)
      q.processAllAvailable()
      assert(spark.table("anom_open").count() === 0L, "open bucket silent")
      // late-but-admissible event lands in the same (open) bucket
      input.addData(Ev(weekTs(0, 1))); q.processAllAvailable()
      assert(spark.table("anom_open").count() === 0L)
      // far-future event seals it with all 4 events counted
      input.addData(Ev(weekTs(5, 0))); q.processAllAvailable()
      val rows = spark.table("anom_open").as[Anom].collect()
      assert(rows.length === 1 && rows.head.n_events === 4L)
    } finally { q.stop() }
  }
}
