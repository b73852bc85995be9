package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StatusStream

/** T1/T2 — windowed status rates through a real Structured Streaming
  * micro-batch execution (MemoryStream → window agg → memory sink). */
class StreamingSpec extends SparkSpec {

  test("windowedRates aggregates per 60s window per metric") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = input.toDF().toDF("time", "status", "value")
    val rates = StatusStream.windowedRates(stream)
    val q = rates.writeStream
      .format("memory")
      .queryName("rates_out")
      .outputMode("append")
      .start()
    try {
      val t0 = 1700000000L
      input.addData(
        (new Timestamp(t0 * 1000), "file_rate", 10.0),
        (new Timestamp((t0 + 30) * 1000), "file_rate", 20.0),
        (new Timestamp((t0 + 90) * 1000), "dir_rate", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData((new Timestamp((t0 + 600) * 1000), "file_rate", 1.0))
      q.processAllAvailable()
      val out = spark.table("rates_out")
        .select("status", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out.contains(("file_rate", 2L, 30.0)))
      assert(out.contains(("dir_rate", 1L, 5.0)))
    } finally q.stop()
  }
}
