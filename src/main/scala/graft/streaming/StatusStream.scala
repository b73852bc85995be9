package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** One monotonic-counter sample (what the reference's status process
  * reads from shared memory each tick, storcrawl.py:503-512). */
final case class CounterSample(time: java.sql.Timestamp, status: String, value: Double)

/** A derived rate row ((now − prev) / interval, storcrawl.py:503-505). */
final case class RateRow(time: java.sql.Timestamp, status: String, rate: Double, units: String)

/** Per-metric state carried between micro-batches. */
final case class MetricState(lastValue: Double, lastEpochSec: Long)

/** T1/T2 — the reference's telemetry loop (storcrawl.py:491-528) and
  * micro-batched sink commits (storcrawl.py:382-391,404-415) as
  * Structured Streaming.
  *
  * The reference computes rates on a 60-second processing-time cadence
  * from monotonic counters and appends status rows; here the same
  * semantics are event-time tumbling windows over a metric stream plus
  * a `Trigger.ProcessingTime` micro-batch `foreachBatch` sink (exactly
  * its commit-every-`--timeout`-seconds behavior). No watermark games
  * beyond late-data cutoff — the reference has no late-data concept
  * (SURVEY.md §2.9 T3).
  */
object StatusStream {

  /** Windowed rate aggregation over a (time, status, value) stream:
    * events-per-interval and value-sum per metric per window — the W2
    * rate analog, computed with event-time windows + watermark. */
  def windowedRates(
      stream: DataFrame,
      window_ : String = "60 seconds",
      watermark: String = "120 seconds"): DataFrame =
    stream
      .withWatermark("time", watermark)
      .groupBy(window(col("time"), window_), col("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("bucket_start"),
        col("status"), col("n"), col("sum_value"))

  /** Stream-stream interval join — correlate two live telemetry
    * streams: each left row pairs with same-key right rows whose event
    * time lands in `[l.time, l.time + windowSec]`. Watermarks on BOTH
    * inputs plus the two-sided time bound let Spark expire join state,
    * so state stays O(window), not O(stream) — the correlation shape
    * the reference's single-process queues never needed but a
    * distributed telemetry bus does. Inner join: matches emit as they
    * arrive; state cleanup follows the watermark. */
  def pairedWithin(
      left: DataFrame,
      right: DataFrame,
      windowSec: Int = 120,
      watermark: String = "120 seconds"): DataFrame = {
    val l = left.toDF("time", "status", "value").withWatermark("time", watermark).alias("l")
    val r = right.toDF("time", "status", "value").withWatermark("time", watermark).alias("r")
    l.join(r,
        col("l.status") === col("r.status") &&
          col("r.time") >= col("l.time") &&
          col("r.time") <= col("l.time") + expr(s"INTERVAL $windowSec seconds"))
      .select(
        col("l.status").as("status"),
        col("l.time").as("event_time"),
        col("r.time").as("sample_time"),
        col("l.value").as("event_value"),
        col("r.value").as("sample_value"))
  }

  /** The reference's stateful rate computation (W2/T1,
    * storcrawl.py:503-505): rate = (counter_now − counter_prev) /
    * elapsed, carrying the previous sample per metric as explicit
    * streaming state — `flatMapGroupsWithState` is the exact Spark
    * shape of its `last_*` locals. Works identically on a batch
    * Dataset (state spans the single batch). */
  def counterRates(samples: Dataset[CounterSample]): Dataset[RateRow] = {
    import samples.sparkSession.implicits._
    samples
      .groupByKey(_.status)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (status: String, it: Iterator[CounterSample], state: GroupState[MetricState]) => {
          val sorted = it.toSeq.sortBy(_.time.getTime)
          var st = state.getOption
          val out = Seq.newBuilder[RateRow]
          sorted.foreach { s =>
            val es = s.time.getTime / 1000
            st.foreach { prev =>
              val dt = math.max(1L, es - prev.lastEpochSec).toDouble
              out += RateRow(s.time, status + " rate",
                (s.value - prev.lastValue) / dt, "per_sec")
            }
            st = Some(MetricState(s.value, es))
          }
          st.foreach(state.update)
          out.result().iterator
        })
  }

  /** Stream-static enrichment join: attach a small dimension (the
    * owners map, a metric catalog) to a live stream. Spark plans the
    * static side as a broadcast rebuilt per micro-batch, so dimension
    * updates between batches are picked up and NOTHING shuffles on the
    * stream side — the shape that holds at any stream rate. */
  def enriched(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Streaming gap-based sessionization — the event-time session
    * analog of the batch `q_sessionize`: activity bursts per metric
    * separated by more than `gap` become separate sessions, closed and
    * emitted once the watermark passes. `session_window` keeps state
    * per open session only (merged on overlap), the 100 TB-friendly
    * shape — no per-event state retention. */
  def sessionRollup(
      stream: DataFrame,
      gap: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("time", watermark)
      .groupBy(session_window(col("time"), gap), col("status"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("status"), col("n_events"), col("sum_value"))

  /** Watermarked streaming dedup: drop re-delivered samples (same
    * (status, time)) within the watermark horizon — bounded state,
    * unlike dropDuplicates whose key set grows forever. The at-least-
    * once ingestion guard a telemetry pipeline puts in front of
    * [[windowedRates]]. */
  def dedupedSamples(
      stream: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("time", watermark)
      .dropDuplicatesWithinWatermark("status", "time")

  /** Micro-batched status sink: commit cadence ↔ the reference's
    * `--timeout` (T2). foreachBatch is at-least-once — after a crash
    * between the sink write and the checkpoint commit, the batch is
    * REPLAYED with the same batchId — so the write must be idempotent
    * to get exactly-once: each batch overwrites its own
    * `batch_id=<id>` partition directory instead of blind-appending.
    * A replay rewrites identical data in place; readers see the whole
    * table via partition discovery on `outPath`. */
  def statusSink(
      rates: DataFrame,
      outPath: String,
      checkpoint: String,
      cadence: String = "60 seconds"): DataStreamWriter[Row] =
    rates.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(cadence))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
      }

  /** Streaming status → database, the reference's live telemetry sink
    * (update_status, storcrawl.py:303-311): each micro-batch appends
    * jsonb-shaped entries to `<schema>.status` on the commit cadence.
    * Telemetry semantics match the reference: at-least-once (a batch
    * replayed after a crash between insert and checkpoint commit
    * re-inserts — the reference's own status INSERTs have no
    * exactly-once either; the parquet [[statusSink]] is the idempotent
    * path). Expects the schema bootstrapped via [[graft.crawl.PgDdl]]. */
  def statusJdbcSink(
      status: DataFrame,
      url: String, schema: String,
      user: String, password: String,
      checkpoint: String,
      cadence: String = "60 seconds"): DataStreamWriter[Row] =
    status.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(cadence))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // the SAME entry shape Crawl.statusJsonb writes (status, value,
        // units, epoch-int time) so batch and streaming rows in one
        // status table stay queryable with one parser; `units` is null
        // when the stream doesn't carry it
        val unitsCol =
          if (batch.columns.contains("units")) col("units")
          else lit(null).cast("string")
        val entries = batch.select(
          to_json(struct(
            col("status"), col("value"), unitsCol.as("units"),
            unix_timestamp(col("time")).as("time"))).as("entry"))
        // quote exactly as the bootstrap DDL did (writeJdbcFull parity)
        graft.crawl.Crawl.writeJdbc(
          entries, url, s"${graft.crawl.PgDdl.quoteIdent(schema)}.status",
          user, password, numPartitions = 1)
      }
}
