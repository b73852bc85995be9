package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream event-time INTERVAL join — the attribution shape: a
  * click joins every impression of the same user that happened within
  * the trailing `windowSec` window. This is the one join form that is
  * genuinely a STREAMING operator rather than a windowed aggregate:
  * both sides are unbounded, so correctness depends on the engine
  * bounding its join state, and Spark's native stream-stream inner
  * join does exactly that when BOTH sides carry watermarks and the
  * join condition carries an event-time range — state for a row is
  * dropped as soon as the other side's watermark proves no future
  * match can arrive (range + watermark delay, kilobytes per user
  * rather than the full history).
  *
  * The reference's analog is the crawl pipeline's producer/consumer
  * pairing of paths to stat results (storcrawl.py:533-536) — a
  * same-key, bounded-lag correlation; here it is re-expressed as the
  * general event-time-range equi-key join a training-data pipeline
  * uses for impression↔click attribution, request↔response latency
  * pairing, and prompt↔completion stitching.
  *
  * Semantics (pinned by the parity spec): INNER join, one output row
  * per qualifying (impression, click) pair — a click with several
  * admissible impressions emits several rows; last-touch/first-touch
  * selection is a downstream ranking concern ([[graft.operators
  * .Sequences]]' attribution operators do it in batch). Works
  * identically on batch Datasets — stream==batch row-set parity is
  * the spec's contract, and a late impression past the watermark is
  * dropped rather than matched.
  */
object StreamIntervalJoin {

  case class Impression(imp_id: Long, user: String, ts: Timestamp)
  case class Click(click_id: Long, user: String, ts: Timestamp)

  def attribute(
      imps: Dataset[Impression],
      clicks: Dataset[Click],
      windowSec: Int,
      watermarkSec: Int,
      joinType: String = "inner"): DataFrame = {
    val i = (if (imps.isStreaming)
               imps.withWatermark("ts", s"$watermarkSec seconds")
             else imps.toDF()).alias("i")
    val c = (if (clicks.isStreaming)
               clicks.withWatermark("ts", s"$watermarkSec seconds")
             else clicks.toDF()).alias("c")
    // equi-key on user + event-time range: the range bound on BOTH
    // join columns is what lets the engine age impression state out
    // (impressions older than click-watermark − windowSec are dead)
    i.join(c, expr(
        s"""i.user = c.user
           |AND c.ts >= i.ts
           |AND c.ts <= i.ts + interval $windowSec seconds""".stripMargin),
        joinType)
      .select(col("c.click_id"), col("i.imp_id"),
        col("i.user").as("user"),
        col("i.ts").as("imp_ts"), col("c.ts").as("click_ts"))
  }

  /** UNATTRIBUTED impressions — the left-outer leg: every impression,
    * matched rows carrying their click and unmatched ones a NULL
    * click_id. In streaming this is the semantics worth pinning: an
    * unmatched impression CANNOT emit when it arrives (a matching
    * click may still come), so the engine holds it and emits the
    * null-extended row only once the watermark proves its window
    * [ts, ts + windowSec] can no longer receive a click — the
    * outer-result delay IS the correctness, and the spec pins it
    * (nothing emits until the closing batch). Batch over the same
    * rows gives the identical row set immediately — stream==batch
    * parity once the stream is closed out. */
  def attributeOuter(
      imps: Dataset[Impression],
      clicks: Dataset[Click],
      windowSec: Int,
      watermarkSec: Int): DataFrame =
    attribute(imps, clicks, windowSec, watermarkSec, "left_outer")
}
