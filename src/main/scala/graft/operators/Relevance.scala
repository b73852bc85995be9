package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Corpus-relevance and corpus-health operators for training-data
  * pipelines: BM25-flavored query scoring, robust (median/MAD) outlier
  * detection, and per-source duplication statistics.
  *
  * All three are one- or two-pass plans whose only global state is a
  * broadcast scalar row (corpus size, document frequencies, median,
  * MAD): at 100 TB each pass is an embarrassingly parallel scan plus a
  * single all-to-one aggregate of a handful of longs — no wide shuffle
  * of document text anywhere.
  *
  * Scoring is pure integer arithmetic (scaled idf, integer division)
  * so the DuckDB twin matches bit-for-bit; `ln()`-based BM25 weights
  * are a one-line swap in production where cross-engine hash equality
  * is not a requirement.
  */
object Relevance {

  type Q = (SparkSession, String) => DataFrame

  private val terms = Seq("data", "scan", "join")

  /** Distinct-content count over md5 digests — the duplication metric
    * shared by [[qDupBySource]] and [[qDatasheet]] (32-byte shuffle
    * keys, never raw text). Engine + oracle spellings kept in lockstep
    * here. */
  private def nUniqCol = countDistinct(md5(col("text"))).as("n_uniq")
  private def dupPctCol = expr("((n_docs - n_uniq) * 100) div n_docs").as("dup_pct")
  private val nUniqSql = "CAST(COUNT(DISTINCT md5(text)) AS BIGINT)"
  private val dupPctSql =
    s"CAST(((COUNT(*) - COUNT(DISTINCT md5(text))) * 100) // COUNT(*) AS BIGINT)"

  /** BM25-shaped relevance of each document to the fixed query
    * {data, scan, join}: per-term contribution
    * `tf * idf_scaled div (dl + 100)` with
    * `idf_scaled = (N - df + 1) * 1e6 div (df + 1)` — the classic
    * rare-term boost and length normalization, kept in exact integer
    * space. One scan computes tf/dl per doc; one broadcast scalar row
    * carries (N, df*) back to a second scan. */
  val qBm25: Q = (s, d) => {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val dl =
      (length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) + 1)
        .cast(LongType)
    val base = docs.select(
      col("doc_id") +: dl.as("dl") +:
        terms.map(t => TextStats.occurrences(col("text"), t).as(s"tf_$t")): _*)
    val dfCols = count(lit(1)).as("n_docs") +:
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = base.agg(dfCols.head, dfCols.tail: _*)
    val contrib = terms
      .map(t => s"((tf_$t * (((n_docs - df_$t + 1) * 1000000) div (df_$t + 1))) div (dl + 100))")
      .mkString(" + ")
    base.crossJoin(broadcast(stats))
      .withColumn("score", expr(contrib))
      .select(col("doc_id") +: col("dl") +:
        terms.map(t => col(s"tf_$t")) :+ col("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Robust outlier detection on document length: median + MAD (median
    * absolute deviation), both exact discrete percentiles, flagging
    * docs with |n_chars − med| > 2·MAD. Two aggregate passes, each a
    * single broadcast scalar — the robust-statistics shape that
    * survives the heavy-tailed length distributions real corpora have
    * (mean/stddev would let one 1 GB document move the fence). */
  val qMadOutliers: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
    val med = docs.agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)")
        .as("med"))
    val devs = docs.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("n_chars") - col("med")))
    val mad = devs.agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS BIGINT)")
        .as("mad"))
    devs.crossJoin(broadcast(mad))
      .filter(col("dev") > col("mad") * 2)
      .select(col("doc_id"), col("n_chars"), col("dev"))
      .orderBy("doc_id")
  }

  /** Per-source duplication health: row count, distinct-content count
    * (over md5 of the text — the shuffle carries 32-byte digests, not
    * documents), duplicate rows and integer duplicate percentage. The
    * per-source report every corpus-ingest pipeline prints first. */
  val qDupBySource: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), nUniqCol)
      .withColumn("dup_rows", col("n_docs") - col("n_uniq"))
      .withColumn("dup_pct", dupPctCol)
      .orderBy("source")

  /** The corpus datasheet: the one-row summary card a dataset release
    * ships with — volume, source diversity, duplication, length
    * distribution (exact discrete percentiles), language mix. ONE scan
    * and one aggregate; at 100 TB this is the cheapest query in the
    * library and the first one anyone runs. */
  val qDatasheet: Q = (s, d) =>
    Tables.documents(s, d).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("n_chars")).cast(LongType).as("total_chars"),
      nUniqCol,
      expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)")
        .as("p25_chars"),
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)")
        .as("p50_chars"),
      expr("CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)")
        .as("p95_chars"),
      min(col("n_chars")).cast(LongType).as("min_chars"),
      max(col("n_chars")).cast(LongType).as("max_chars"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
    .withColumn("dup_pct", dupPctCol)

  val queries: Map[String, Q] = Map(
    "q_bm25" -> qBm25,
    "q_mad_outliers" -> qMadOutliers,
    "q_dup_by_source" -> qDupBySource,
    "q_datasheet" -> qDatasheet)

  val oracle: Map[String, String] = Map(
    "q_bm25" -> {
      val tfs = terms
        .map(t => s"${TextStats.occurrencesDuck("text", t)} AS tf_$t")
        .mkString(",\n    ")
      val dfs = terms
        .map(t => s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
        .mkString(", ")
      val contrib = terms
        .map(t => s"((tf_$t * (((n_docs - df_$t + 1) * 1000000) // (df_$t + 1))) // (dl + 100))")
        .mkString(" + ")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS dl,
         |    $tfs
         |  FROM documents WHERE text IS NOT NULL),
         |stats AS (SELECT COUNT(*) AS n_docs, $dfs FROM base)
         |SELECT doc_id, dl, ${terms.map(t => s"CAST(tf_$t AS BIGINT) AS tf_$t").mkString(", ")},
         |  CAST($contrib AS BIGINT) AS score
         |FROM base, stats
         |ORDER BY score DESC, doc_id""".stripMargin
    },
    "q_mad_outliers" ->
      """WITH med AS (
        |  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS med
        |  FROM documents),
        |devs AS (
        |  SELECT doc_id, n_chars, abs(n_chars - med) AS dev FROM documents, med),
        |mad AS (
        |  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS BIGINT) AS mad
        |  FROM devs)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(dev AS BIGINT) AS dev
        |FROM devs, mad WHERE dev > 2 * mad ORDER BY doc_id""".stripMargin,
    "q_datasheet" ->
      s"""SELECT COUNT(*) AS n_docs,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  $nUniqSql AS n_uniq,
        |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p25_chars,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p50_chars,
        |  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p95_chars,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |  $dupPctSql AS dup_pct
        |FROM documents""".stripMargin,
    "q_dup_by_source" ->
      s"""SELECT source,
        |  COUNT(*) AS n_docs,
        |  $nUniqSql AS n_uniq,
        |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS dup_rows,
        |  $dupPctSql AS dup_pct
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
}
