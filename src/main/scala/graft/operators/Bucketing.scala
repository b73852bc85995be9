package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) table support — the co-located join story.
  *
  * At 100 TB the expensive part of a fact⋈fact join is the shuffle of
  * both sides on the join key. Writing the tables bucketed on that key
  * moves the shuffle to WRITE time, once: each side is hash-split into
  * `n` bucket files per partition, and every later join or aggregation
  * on the bucket key reads bucket i of A and bucket i of B into the
  * same task — `.explain` shows SortMergeJoin with NO Exchange on
  * either side (and no sort either, when `sortBy` matches the join
  * key). Re-used across every downstream query, this is the single
  * biggest shuffle eliminator Spark offers; the same layout also makes
  * bucket-key `groupBy` exchange-free.
  *
  * Catalog note: bucketing metadata lives in the session catalog
  * (datasource tables), so the write is `bucketBy(...).sortBy(...)
  * .saveAsTable(...)` — a plain `.parquet(path)` write cannot carry
  * bucket info. Bucket count is a layout contract: pick it once per
  * table family (co-bucketed joins need compatible counts — equal, or
  * one a multiple of the other with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted datasource table. `path` pins the
    * files outside the default warehouse when given (external table). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil,
      path: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketed write needs at least one bucket column")
    var w = df.write.format("parquet").mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  /** Exchange nodes in the executed plan of `df` — 0 for a correctly
    * co-located bucketed join. RUNS the query first: merely building
    * `executedPlan` leaves an AdaptiveSparkPlan at its initial
    * pre-runtime shape, so the count would reflect exchanges AQE later
    * removes (or miss ones it inserts); after execution the adaptive
    * plan prints its final tree. */
  def exchangeCount(df: DataFrame): Int = {
    // run the job but keep rows on the executors — a collect here
    // would drag the whole result to the driver just to finalize AQE
    df.queryExecution.executedPlan.execute().foreachPartition(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning") ||
        l.contains("Exchange SinglePartition"))
  }

  /** Join two co-bucketed tables on their bucket key. With matching
    * bucket layouts this plans shuffle-free (and sort-free when both
    * sides were `sortBy` the key). */
  def coLocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
