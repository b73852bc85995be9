package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver testdata tables (`TESTDATA.md`).
  *
  * All readers are plain parquet scans so Catalyst pushdown / column
  * pruning reach the file source. The only special case is `events`:
  * its `ts` column has shipped in two physical forms across fixture
  * generations — INT64 TIMESTAMP(NANOS) (pre-2026-08-13) and
  * timestamp[us] (current, see FIXTURES.md) — so [[events]] inspects
  * the resolved dtype and normalizes either to epoch-nanos BIGINT.
  * Entry points still set `spark.sql.legacy.parquet.nanosAsLong=true`
  * AT BUILD TIME purely for back-compat with nanos-typed fixtures
  * (harmless for timestamp[us]); it is deliberately NOT set inside
  * the reader, which would mutate shared session state from
  * concurrently-running query functions. Sessions must also pin
  * `spark.sql.session.timeZone=UTC` (all entry points do) so NTZ
  * wall-clocks resolve to the instants the oracle computes.
  */
object Tables {
  /** Resolved readers memoized per (session, path). `spark.read.parquet`
    * eagerly lists files and reads footer schema, and the first plan over
    * the returned Dataset caches its physical planning — without
    * memoization EVERY query in a 97-query workload re-paid that floor
    * (file listing + schema inference + `spread`'s `df.rdd` replan of the
    * scan). Contract: a (session, path) pair is immutable once read — true
    * for the driver testdata and every spec fixture (each writes a fresh
    * temp dir exactly once). The map holds logical plans only (bytes per
    * entry) for the handful of sessions a JVM creates. */
  private val tableCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // drop entries for stopped sessions so a JVM that churns sessions
    // (the test suite) does not retain every dead session's plans and
    // file listings for its lifetime
    tableCache.keysIterator
      .filter(_._1.sparkContext.isStopped)
      .foreach(tableCache.remove)
    tableCache.getOrElseUpdate((spark, s"$dir/$name.parquet"),
      spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Drop every cached reader whose path starts with `pathPrefix`, for
    * all sessions. The memoization contract is "a path is immutable
    * once read"; any code that overwrites or appends under a previously
    * read directory MUST call this afterwards, or same-session readers
    * keep the stale file listing (silently stale data, not an error).
    * Writers inside this repo ([[graft.operators.Dedup.buildArtifacts]],
    * spec fixtures that rewrite a dir) do. */
  def invalidate(pathPrefix: String): Unit = {
    // boundary-aware: invalidate("/x/out") must drop "/x/out" and
    // "/x/out/part.parquet" but NOT the sibling "/x/out2" — raw
    // startsWith over-invalidates, silently defeating the memoization
    val dirPrefix = pathPrefix.stripSuffix("/") + "/"
    tableCache.keysIterator
      .filter(k => k._2 == pathPrefix || k._2.startsWith(dirPrefix))
      .foreach(tableCache.remove)
    invalidationHooks.values.foreach(_(pathPrefix))
  }

  /** Derived-artifact caches elsewhere (e.g. the suffix-rank memo in
    * [[graft.operators.CorpusOps]]) share the immutability contract and
    * must flush with the reader cache: they register here, keyed by a
    * stable name so re-registration replaces rather than accumulates. */
  private val invalidationHooks =
    scala.collection.concurrent.TrieMap.empty[String, String => Unit]

  def onInvalidate(name: String)(f: String => Unit): Unit =
    invalidationHooks.put(name, f)

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Spread a narrow scan across the cluster before expensive per-row
    * work. Parquet splits at row-group granularity, so a small or
    * single-row-group file reads as ONE partition — and any costly map
    * pipeline above it (shingle digests, per-pair cosines) serializes
    * on one core until the first shuffle. When the plan has fewer
    * input partitions than cores, pay one small shuffle to fan out;
    * when the scan already has enough splits (the 100 TB case), this
    * is a no-op and costs nothing. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** `events` with `ts` normalized to LongType epoch-nanoseconds,
    * whatever the physical parquet type. The fixtures have shipped
    * both representations (INT64 TIMESTAMP(NANOS) historically,
    * timestamp[us] since 2026-08-13 — see FIXTURES.md), so the reader
    * branches on the resolved dtype instead of assuming one:
    *
    *  - LongType (nanosAsLong legacy path): already epoch-nanos, pass
    *    through untouched.
    *  - TimestampType / TimestampNTZType: `unix_micros` × 1000. NTZ is
    *    first cast to TIMESTAMP, which interprets the wall-clock in
    *    the session TZ — every entry point pins UTC, so the instant is
    *    preserved. Max epoch-micros (~1.7e15) × 1000 ≈ 1.7e18 fits
    *    Long with 5× headroom; the multiply is exact integer math.
    *
    * Downstream code ([[graft.functions.Exprs.nanosToSec]] callers,
    * [[eventsWithEpoch]]) thus sees one stable contract: `ts` is
    * epoch-nanos BIGINT. This mirrors the reference, which reads the
    * status table's `time timestamptz` as a real instant
    * (report.py:118-159) regardless of the column's storage form. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampType | TimestampNTZType =>
        raw.withColumn(
          "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected BIGINT epoch-nanos or TIMESTAMP[_NTZ]")
    }
  }

  /** `events.ts` normalized to epoch seconds (truncating, matching the
    * reference's `int(float_epoch)` truncation, storcrawl.py:368-370). */
  def eventsWithEpoch(s: SparkSession, d: String): DataFrame =
    events(s, d)
      // integer `div`, not `/`: double division loses precision above
      // 2^53 and epoch-nanos (~1.7e18) are far beyond that
      .withColumn("ts_sec", expr("ts div 1000000000"))
      .withColumn("ts_us", expr("ts div 1000"))
}
