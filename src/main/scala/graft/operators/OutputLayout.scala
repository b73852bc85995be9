package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Output file layout — the write-side half of the 100 TB story. A
  * pipeline stage that emits millions of kilobyte parquet files (or a
  * handful of 50 GB ones) poisons every downstream scan: file-open
  * overhead, no parallelism, or listing storms. These helpers size the
  * output to a byte target and optionally cluster rows so downstream
  * min/max pruning (see [[graft.functions.ZOrderExpr]] and ZOrderSpec)
  * actually bites.
  *
  * Sizing uses Catalyst's own cost statistics (`optimizedPlan.stats`),
  * not a driver-side listing — the same estimate the planner uses for
  * broadcast decisions, available before any job runs.
  */
object OutputLayout {

  /** Output partition (≈ file) count so each file lands near
    * `targetBytes` of in-memory row data. Parquet compresses 2-5×, so
    * aim `targetBytes` at ~3× the on-disk size you want.
    *
    * Leaf nodes without statistics (a localCheckpointed frame plans as
    * LogicalRDD, whose size estimate is the `defaultSizeInBytes`
    * "unknown" sentinel ≈ Long.MaxValue) would clamp to the 2^20 cap —
    * a million-partition shuffle write for a table of any size. Fall
    * back to the frame's current partition count instead: checkpointed
    * data is already shaped by the shuffle that produced it. */
  def sizedPartitionCount(df: DataFrame, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(Long.MaxValue) / 2) df.rdd.getNumPartitions.max(1)
    else {
      val n = (bytes + targetBytes - 1) / targetBytes
      n.min(BigInt(1) << 20).max(1).toInt
    }
  }

  /** Write `df` as ~`targetBytes`-sized parquet files. With
    * `clusterCols`, rows are range-partitioned and sorted on those
    * columns so each file covers a narrow key range — the layout that
    * gives parquet row-group min/max pruning its selectivity. Without,
    * a plain round-robin repartition balances file sizes exactly. */
  def writeSized(df: DataFrame, path: String, targetBytes: Long,
      clusterCols: Seq[String] = Nil): Unit = {
    val n = sizedPartitionCount(df, targetBytes)
    val shaped =
      if (clusterCols.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*)
    shaped.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-file compaction: rewrite a directory of parquet fragments
    * (streaming sink output, per-task files from a wide shuffle) into
    * size-targeted files. Row-identical, layout-only. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, clusterCols: Seq[String] = Nil): Unit =
    writeSized(spark.read.parquet(inDir), outDir, targetBytes, clusterCols)
}
