package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Streaming windowed quantiles — the ingest-time twin of the batch
  * KLL percentile path ([[graft.functions.KllSketchAgg]]): per
  * event-time tumbling window, a mergeable quantile sketch of a DOUBLE
  * metric, read out as p50/p90/p99 when the watermark closes the
  * window. The pipeline uses: crawl latency/size distributions per
  * minute, document-length drift during ingest, shard-size percentiles
  * while packing — anywhere "what does the distribution look like
  * RIGHT NOW" must not wait for a batch rollup.
  *
  * Shape: this is deliberately the NATIVE Structured Streaming path —
  * `withWatermark` + `groupBy(window(...))` + a TypedImperativeAggregate
  * whose serialize/merge the state store already knows how to run
  * (partial sketches merge map-side, kilobytes of state per window,
  * Append emission exactly once per closed window). No
  * mapGroupsWithState needed: when the aggregate itself is mergeable,
  * the engine's windowed aggregation IS the right operator — custom
  * state (StreamHeavyHitters, StreamDedup) is reserved for semantics
  * aggregation can't express.
  *
  * Exactness regime (what the parity spec pins): a KLL sketch holds
  * every value exactly while n ≤ k (= 200 here), so windows under 200
  * events produce EXACT percentiles equal to the batch aggregate over
  * the same rows; beyond that the ±1.7% rank-error band applies and
  * stream/batch stay sketch-identical only in distribution, not bytes.
  */
object StreamQuantiles {

  case class Metric(ts: Timestamp, value: Double)

  /** A metric owned by a session key (crawl id, worker, user). */
  case class KeyedMetric(key: String, ts: Timestamp, value: Double)

  private def kllBytes(value: Column): Column =
    ColumnBridge.column(
      graft.functions.KllSketchAgg(ColumnBridge.expression(value))
        .toAggregateExpression())

  private def kllQuantile(sketch: Column, rank: Double): Column =
    ColumnBridge.column(graft.functions.KllQuantileExpr(
      ColumnBridge.expression(sketch),
      ColumnBridge.expression(lit(rank))))

  /** Tumbling-window quantiles over a (possibly streaming) metric
    * Dataset. Works identically on a batch Dataset — the parity spec's
    * contract. */
  def windowQuantiles(
      metrics: Dataset[Metric],
      windowSec: Int,
      watermarkSec: Int): DataFrame = {
    val withWm =
      if (metrics.isStreaming)
        metrics.withWatermark("ts", s"$watermarkSec seconds")
      else metrics.toDF()
    withWm
      .groupBy(window(col("ts"), s"$windowSec seconds").as("w"))
      .agg(count(lit(1)).as("n"), kllBytes(col("value")).as("sk"))
      .select(col("w.start").as("w_start"), col("n"),
        kllQuantile(col("sk"), 0.5).as("p50"),
        kllQuantile(col("sk"), 0.9).as("p90"),
        kllQuantile(col("sk"), 0.99).as("p99"))
  }

  /** GAP-session quantiles: per (key, session_window) KLL percentiles
    * of a metric — the telemetry shape the reference's status loop
    * implies (rate percentiles per crawl session, storcrawl.py:503-505
    * aggregates per status tick; a session here is one burst of crawl
    * activity separated by ≥ gap of silence). Same native path as
    * [[windowQuantiles]]: `session_window` is itself a mergeable state
    * machine the engine already runs inside windowed aggregation, and
    * KLL is a mergeable TypedImperativeAggregate — their composition
    * needs NO custom state, sessions extend/merge across micro-batches
    * and the sketch merges along with them.
    *
    * Boundary convention (MEASURED on Spark 4.1.2, pinned by the spec
    * in both stream and batch): session windows are half-open
    * [start, last + gap), and an event at exactly `last + gap` MERGES
    * — touching windows coalesce, so a new session starts only when
    * the silence is STRICTLY longer than the gap (the same `> gap`
    * rule as the lag-islands form). Exactness regime as
    * [[windowQuantiles]]: sessions under k (= 200) events read back
    * exact percentiles equal to the batch aggregate over the same
    * rows. */
  def sessionQuantiles(
      metrics: Dataset[KeyedMetric],
      gapSec: Int,
      watermarkSec: Int): DataFrame = {
    val withWm =
      if (metrics.isStreaming)
        metrics.withWatermark("ts", s"$watermarkSec seconds")
      else metrics.toDF()
    withWm
      .groupBy(col("key"),
        session_window(col("ts"), s"$gapSec seconds").as("w"))
      .agg(count(lit(1)).as("n"), kllBytes(col("value")).as("sk"))
      .select(col("key"), col("w.start").as("s_start"),
        col("w.end").as("s_end"), col("n"),
        kllQuantile(col("sk"), 0.5).as("p50"),
        kllQuantile(col("sk"), 0.9).as("p90"),
        kllQuantile(col("sk"), 0.99).as("p99"))
  }
}
