package graft.crawl

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** The reference's log-listener analog (storcrawl.py:288-301,544-545):
  * every worker emits a progress line each `log_count` = 10k records,
  * funneled through ONE central log process draining a queue. Spark's
  * ListenerBus is that same architecture already — tasks post metric
  * updates to a driver-side event queue with a single consumer — so the
  * rebuild implements the cadence as a SparkListener: on each task end
  * the merged crawl accumulators are read, and one line is emitted per
  * `every`-record boundary crossed. Same observability contract
  * (progress cadence tied to records processed, centralized sink, no
  * shared-memory locks), minus the reference's two global `Value`
  * locks — its biggest contention point.
  *
  * Register via [[ProgressListener.register]] around a crawl; the
  * listener is cheap (two atomic reads per task end) and safe to leave
  * attached.
  */
final class ProgressListener(
    ctrs: CrawlCounters,
    every: Long = ProgressListener.DefaultEvery,
    log: String => Unit = s => System.err.println(s)) extends SparkListener {

  private val lastMark = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val total = ctrs.filesSeen.value + ctrs.dirsSeen.value
    val mark = total / every
    val prev = lastMark.get
    // one line per crossed boundary, however many tasks land at once
    if (mark > prev && lastMark.compareAndSet(prev, mark)) {
      log(s"[crawl] total count $total " +
        s"(files ${ctrs.filesSeen.value} dirs ${ctrs.dirsSeen.value} " +
        s"bytes ${ctrs.totalSize.value} stat errors ${ctrs.statErrors.value})")
    }
  }
}

object ProgressListener {
  /** storcrawl.py:80 — `log_count = 10000`. */
  val DefaultEvery = 10000L

  /** Attach a progress listener for `ctrs`; returns it for
    * `spark.sparkContext.removeSparkListener` when the crawl ends. */
  def register(
      spark: org.apache.spark.sql.SparkSession,
      ctrs: CrawlCounters,
      every: Long = DefaultEvery,
      log: String => Unit = s => System.err.println(s)): ProgressListener = {
    val l = new ProgressListener(ctrs, every, log)
    spark.sparkContext.addSparkListener(l)
    l
  }
}
