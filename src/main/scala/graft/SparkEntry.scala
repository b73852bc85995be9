package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOf, CorpusOps, Dedup, Evaluation, Graphs, IndexStats, Multimodal, Packing, Pretrain, Profiling, Ranking, Relational, Relevance, Reports, Selection, Sequences, SignLsh, Similarity, Snapshots, TextStats}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory (SURVEY.md §2 +
  * the training-data-pipeline extensions); every key has a DuckDB twin
  * in `oracleSql` with identical column names, types, and total order.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The dimension-join spine (J4): fact ⋈ 4 dims, broadcast hash joins,
    * grouped revenue rollup. */
  def entry(spark: SparkSession): DataFrame =
    Reports.qDimEquijoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Reports.queries ++ Dedup.queries ++ TextStats.queries ++
      Similarity.queries ++ AsOf.queries ++ Relational.queries ++ SignLsh.queries ++
      Ranking.queries ++ Packing.queries ++ Relevance.queries ++ CorpusOps.queries ++
      Snapshots.queries ++ Sequences.queries ++ Selection.queries ++ Graphs.queries ++
      Pretrain.queries ++ IndexStats.queries ++ Profiling.queries ++
      Evaluation.queries ++ Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every oracle routes through
    * [[OracleSql.materializeShared]], which marks multiply-referenced
    * CTEs `AS MATERIALIZED` — DuckDB 1.0 inlines shared CTEs per
    * reference, and one pathologically re-expanding oracle bricked the
    * round-9 correctness gate (see OracleSql's scaladoc). */
  def oracleSql: Map[String, String] =
    (Reports.oracle ++ Dedup.oracle ++ TextStats.oracle ++
      Similarity.oracle ++ AsOf.oracle ++ Relational.oracle ++ SignLsh.oracle ++
      Ranking.oracle ++ Packing.oracle ++ Relevance.oracle ++ CorpusOps.oracle ++
      Snapshots.oracle ++ Sequences.oracle ++ Selection.oracle ++ Graphs.oracle ++
      Pretrain.oracle ++ IndexStats.oracle ++ Profiling.oracle ++
      Evaluation.oracle ++ Multimodal.oracle)
      .view.mapValues(OracleSql.materializeShared).toMap
}
