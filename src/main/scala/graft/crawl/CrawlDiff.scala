package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Snapshot diff — the natural two-crawl question a storage-crawler
  * user asks ("what changed since last week's crawl?"): which paths
  * appeared, vanished, or changed size/mtime/mode/owner between two
  * `files` DataFrames (two crawl tags of the reference's per-crawl
  * schemas, storcrawl.py:97-107 — the reference keeps every crawl
  * queryable side by side precisely so this comparison is possible,
  * but offers no operator for it; this is that operator).
  *
  * Plan shape: ONE full-outer shuffle join on `path`, null-safe
  * comparisons for the change classification — no window, no collect.
  * At 100 TB: snapshots written bucketed on `path`
  * ([[graft.operators.Bucketing]]) diff with no shuffle at all; the
  * join key is the path, so skew is bounded by path uniqueness (keys
  * are unique per side — a 1:1 join).
  */
object CrawlDiff {

  /** Columns whose change flips a path from `unchanged` to `modified`. */
  val DefaultCompareCols: Seq[String] = Seq("st_size", "st_mtime", "st_mode", "owner")

  /** Diff `after` against `before` keyed on `path`.
    *
    * Output: `path`, `change` (added|removed|modified), the old/new
    * value pair for every compared column, and `size_delta`
    * (new − old, 0-defaulted) — `unchanged` rows are dropped unless
    * `includeUnchanged`. */
  def diff(
      before: DataFrame,
      after: DataFrame,
      compareCols: Seq[String] = DefaultCompareCols,
      includeUnchanged: Boolean = false): DataFrame = {
    val cols = compareCols.filter(c =>
      before.columns.contains(c) && after.columns.contains(c))
    val b = before.select((Seq("path") ++ cols).map(col): _*).as("b")
    val a = after.select((Seq("path") ++ cols).map(col): _*).as("a")
    val joined = b.join(a, col("b.path") === col("a.path"), "full_outer")
    val changedAny = cols
      .map(c => !(col(s"b.$c") <=> col(s"a.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val change = when(col("b.path").isNull, "added")
      .when(col("a.path").isNull, "removed")
      .when(changedAny, "modified")
      .otherwise("unchanged")
    val pairs = cols.flatMap(c =>
      Seq(col(s"b.$c").as(s"old_$c"), col(s"a.$c").as(s"new_$c")))
    // size_delta only exists when st_size survived the column filter —
    // a zero literal keeps the output schema stable for pruned inputs
    val sizeDelta =
      if (cols.contains("st_size"))
        (coalesce(col("a.st_size"), lit(0L)) - coalesce(col("b.st_size"), lit(0L)))
          .cast(LongType)
      else lit(0L)
    val out = joined.select(
      Seq(coalesce(col("a.path"), col("b.path")).as("path"),
        change.as("change")) ++ pairs :+ sizeDelta.as("size_delta"): _*)
    if (includeUnchanged) out else out.filter(col("change") =!= "unchanged")
  }

  /** Rollup of a diff: per change kind, path count and net bytes. */
  def summary(diffDf: DataFrame): DataFrame =
    diffDf.groupBy(col("change"))
      .agg(count(lit(1)).as("n_paths"),
        sum(col("size_delta")).cast(LongType).as("net_bytes"))
      .orderBy("change")
}
