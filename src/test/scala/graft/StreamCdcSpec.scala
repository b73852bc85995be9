package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sequences
import graft.streaming.StreamCdc
import graft.streaming.StreamCdc.CdcEvent

/** Batch/stream parity for CDC application: the fixture event stream,
  * fed through [[StreamCdc.applyChanges]] in two arrival-scrambled
  * halves, must converge to EXACTLY the snapshot
  * [[Sequences.qCdcApply]] computes over the same rows in one batch
  * pass — last-op tombstones, last-upsert values, op counts, all of
  * it. The per-user update with the highest n_ops is the final one
  * (n_ops grows monotonically per entity), which is how the memory
  * sink's update log collapses back to a snapshot.
  */
class StreamCdcSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("two scrambled half-streams converge to the batch CDC snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"),
        graft.functions.Exprs.intScaled(
          graft.functions.Exprs.dec2(col("value")), 100L).as("v_cents"))
      .collect()
      .map { r =>
        val us = r.getLong(3)
        val t = new Timestamp(us / 1000)
        t.setNanos(((us % 1000000) * 1000).toInt)
        CdcEvent(r.getLong(0), r.getLong(1), r.getString(2), t, r.getLong(4))
      }

    // halves split by event_id parity, each internally REVERSED — the
    // stream sees late/early interleavings the batch never does
    val (h1, h2) = rows.partition(_.event_id % 2 == 0)

    val input = MemoryStream[CdcEvent]
    val q = StreamCdc.applyChanges(input.toDS())
      .writeStream.format("memory").queryName("cdc_stream_out")
      .outputMode("update").start()
    try {
      input.addData(h1.reverse.toSeq)
      q.processAllAvailable()
      input.addData(h2.reverse.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    // final snapshot = the max-n_ops update per user (n_ops grows
    // monotonically per entity, so it versions the update log)
    val finals = spark.table("cdc_stream_out").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_ops"), r.getAs[String]("last_op"),
          r.getAs[Long]("last_ts_us"), r.getAs[Long]("current_cents"),
          r.getAs[Long]("alive"))))
      .groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).maxBy(_._1) }

    val batch = Sequences.qCdcApply(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_ops"), r.getAs[String]("last_op"),
          r.getAs[Long]("last_ts_us"), r.getAs[Long]("current_cents"),
          r.getAs[Long]("alive"))))
      .toMap

    assert(finals === batch)
  }

  test("epochUs keeps parquet microsecond precision through Timestamp") {
    val t = new Timestamp(1704067207179L) // ms epoch
    t.setNanos(179575000) // 179.575 ms in nanos
    assert(StreamCdc.epochUs(t) === 1704067207179575L)
  }
}
