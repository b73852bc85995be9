package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch aggregates — the approximate layer a 100 TB engine
  * needs where exact answers would rescan the corpus: HLL distinct
  * sketches (Spark's Apache DataSketches builtins) computed once per
  * shard/partition/day and merged at query time.
  *
  * The scale contract is MERGEABILITY, not just approximation: a sketch
  * column persisted alongside each ingest increment lets any later
  * rollup (per-day → per-month → global) run over kilobytes of sketch
  * state instead of the raw data. Union semantics: sparse-mode sketches
  * carry a stream-order (HIP) estimator a union cannot preserve
  * bit-for-bit, so the merge contract is the ERROR BAND — however the
  * stream was sharded, the merged estimate lands within the lgK
  * tolerance of exact (SketchSpec asserts this at two shardings).
  *
  * Exact-answer queries stay on the oracle surface (`q_doc_freq` etc.);
  * sketches are deliberately unit-verified only (DuckDB's HLL is a
  * different implementation, so cross-engine hashes cannot match).
  */
object Sketches {

  /** Per-group distinct-count sketch: one binary sketch column, 4–12 KB
    * per group at lgK=12 (±1.6% rse), map-side combined like any
    * partial aggregate. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("dv_sketch"))

  /** Estimate from a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Merge per-increment sketches (e.g. one row per ingest batch) into
    * a per-group rollup — the no-rescan path. */
  def mergeSketches(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("dv_sketch")).as("dv_sketch"))

  /** One-shot approximate distinct per group via the same sketch path,
    * returned as (group, estimate). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    distinctSketch(df, groupCols, valueCol, lgK)
      .withColumn("approx_distinct", estimate(col("dv_sketch")))
      .drop("dv_sketch")
}
