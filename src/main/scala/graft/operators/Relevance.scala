package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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

  /** q_sparse_cosine — sparse-vector "more like this" retrieval: each
    * probe document (doc_id < 8) is matched against the corpus under
    * tf-idf cosine, computed entirely through the inverted index —
    * documents meet ONLY on the terms they share, never as dense
    * vectors. The sparse twin of [[Similarity.qAnnTopk]]: dense ANN
    * finds semantic neighbors, sparse cosine finds lexical ones, and
    * hybrid retrieval wants both.
    *
    * Weights are exact integers (`tf × idf_scaled`, the [[qBm25]]
    * scaling at 10³) so dots and norms aggregate exactly; the final
    * cosine shares the [[Similarity.cosMicrosPre]] determinism
    * contract (double divide on a 6-dp grid, id tiebreak).
    *
    * Scale shape: the tf table is computed once and feeds df, norms,
    * and the dot join; the probe side (8 docs × ≤|vocab| terms)
    * broadcasts; the corpus side streams through a word-keyed join —
    * the posting-list traversal — then one (qid, doc) aggregate and a
    * per-probe top-5 window. The df join is deliberately UNHINTED:
    * AQE broadcasts a small vocabulary, a web-scale type count plans
    * as a shuffled join instead of an OOMing forced broadcast. */
  val qSparseCosine: Q = (s, d) => sparseTopK(s, d, nProbes = 8)

  /** The shared tf-idf retrieval spine: top-5 lexical neighbors per
    * probe (probes = doc_id < nProbes), as (qid, rnk, doc_id,
    * sim_micros). [[qSparseCosine]] ships the 8-probe report;
    * [[qRetrievalEval]] widens to 64 probes and scores the ranking
    * against labels. */
  /** The probe-independent tf-idf weight table (doc_id, word, w) and
    * per-doc norms, memoized per (session, dir) under [[graft.Memo]]'s
    * immutability/invalidation contract — the same in-session spine
    * pattern as the dedup pair memo and the suffix-rank memo. FOUR
    * report queries ([[qSparseCosine]], [[qRrfFusion]]'s sparse
    * channel, [[qRetrievalEval]], [[qNdcg]]) sit on the identical
    * explode→tf→df→weight pipeline and differ only in probe count;
    * un-memoized, a retrieval report priced the corpus-wide token
    * explode + two aggregations once PER QUERY (at 100 TB: four
    * corpus scans for one scorecard). The entries are the
    * corpus-token-sized weight rows and the |docs|-sized norms —
    * the same order as the suffix-rank memo's entry. */
  private val wtabMemo = new graft.Memo("relevance-tfidf-weights")
  private val normsMemo = new graft.Memo("relevance-tfidf-norms")

  private def tfidfWeights(s: SparkSession, d: String): DataFrame =
    wtabMemo(s, d) {
      val docs = Tables.spread(Tables.documents(s, d).filter(col("text").isNotNull))
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      tf.join(dfreq, Seq("word"))
        .crossJoin(broadcast(nDocs))
        .withColumn("w",
          expr("tf * (((n_docs - df + 1) * 1000) div (df + 1))").cast(LongType))
        .select("doc_id", "word", "w")
    }

  private def tfidfNorms(s: SparkSession, d: String): DataFrame =
    normsMemo(s, d) {
      tfidfWeights(s, d).groupBy("doc_id")
        .agg(sum(expr("w * w")).cast(DoubleType).as("nrm"))
    }

  private def sparseTopK(s: SparkSession, d: String, nProbes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wtab = tfidfWeights(s, d)
    val norms = tfidfNorms(s, d)
    val probes = wtab.filter(col("doc_id") < nProbes)
      .select(col("doc_id").as("qid"), col("word"), col("w").as("qw"))
    val dots = broadcast(probes)
      .join(wtab, Seq("word"))
      .filter(col("doc_id") =!= col("qid"))
      .groupBy("qid", "doc_id")
      .agg(sum(expr("qw * w")).as("dot"))
    val sim = dots
      .join(norms.select(col("doc_id").as("qid"), col("nrm").as("nq")), Seq("qid"))
      .join(norms, Seq("doc_id"))
      .select(col("qid"), col("doc_id"),
        Similarity.cosMicrosPre(col("dot"), col("nq"), col("nrm")).as("sim_micros"))
    val w = Window.partitionBy("qid").orderBy(col("sim_micros").desc, col("doc_id"))
    sim.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 5)
      .select("qid", "rnk", "doc_id", "sim_micros")
      .orderBy("qid", "rnk")
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

  /** q_retrieval_eval — ranking-quality scorecard of the sparse tf-idf
    * retriever against the embedding labels (the shared doc_id/vec_id
    * key space is what makes the corpus cross-modal): 64 probes, each
    * probe's top-5 lexical neighbors scored by whether they carry the
    * probe's label — per label, Precision@1 in permille and MRR@5 in
    * milli (1000/first-correct-rank, 0 when none of the 5 is correct;
    * both exact integer arithmetic). The IR-eval companion to
    * [[graft.operators.Similarity]]'s dense `q_knn_classify`: same
    * truth labels, lexical channel — comparing the two tables is the
    * hybrid-retrieval design argument made with numbers.
    *
    * Scale shape: inherits [[sparseTopK]]'s posting-list spine; the
    * label joins are UNHINTED — the (vec_id,label) frame is
    * corpus-sized at 100 TB (forcing it broadcast was r9's "weak"
    * flag), while the probe×top-k side is tiny (64×5 rows), so AQE's
    * runtime size stats pick the broadcast side correctly (it
    * broadcasts the top-k side, never the labels); then a per-probe
    * 5-row aggregate and a |labels|-group rollup. */
  val qRetrievalEval: Q = (s, d) => {
    val labels = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast(LongType).as("label"))
    val top = sparseTopK(s, d, nProbes = 64)
    val scored = top
      .join(labels.select(col("vec_id").as("qid"),
        col("label").as("true_label")), Seq("qid"))
      .join(labels.select(col("vec_id").as("doc_id"),
        col("label").as("n_label")), Seq("doc_id"))
    val perProbe = scored.groupBy("qid", "true_label")
      .agg(
        min(when(col("n_label") === col("true_label"), col("rnk"))).as("fc"),
        max(when(col("rnk") === 1 && col("n_label") === col("true_label"), 1L)
          .otherwise(0L)).as("p1"))
    perProbe.groupBy(col("true_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("p1")).cast(LongType).as("n_p1"),
        sum(coalesce(expr("1000 div fc"), lit(0L))).cast(LongType)
          .as("mrr_sum_milli"))
      .withColumn("p1_permille",
        expr("(n_p1 * 1000) div n_queries").cast(LongType))
      .withColumn("mrr_milli",
        expr("mrr_sum_milli div n_queries").cast(LongType))
      .select("label", "n_queries", "n_p1", "p1_permille", "mrr_milli")
      .orderBy("label")
  }

  /** q_ndcg — nDCG@5 of the sparse tf-idf retriever (Järvelin &
    * Kekäläinen 2002, the position-discounted standard that P@1/MRR
    * ([[qRetrievalEval]]) cannot replace: it credits EVERY relevant
    * hit, discounted by rank). Binary gains; the 1/log2(1+r) discounts
    * are INTEGER micro constants (1e6-scaled, floor), so no float ever
    * crosses an engine boundary: DCG = Σ discount(rank) over hits,
    * IDCG = prefix-sum(min(R,5)) where R = |same-label corpus vectors|
    * − 1 (the query itself can't be retrieved — sparseTopK excludes
    * self), ndcg_permille = (DCG·1000) div IDCG, averaged per label.
    *
    * Scale shape: inherits [[sparseTopK]]'s posting-list spine; the
    * label joins stay UNHINTED like [[qRetrievalEval]]'s (corpus-sized
    * at 100 TB); the label-count side is |labels| rows. */
  val qNdcg: Q = (s, d) => {
    val labels = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast(LongType).as("label"))
    val labelCnt = labels.groupBy("label").agg(count(lit(1)).as("c_lbl"))
    val top = sparseTopK(s, d, nProbes = 64)
    // floor(1e6 / log2(1+r)) for r = 1..5 — integer literals, shared
    // verbatim with the oracle
    val gain = expr("CASE rnk WHEN 1 THEN 1000000L WHEN 2 THEN 630929L " +
      "WHEN 3 THEN 500000L WHEN 4 THEN 430676L ELSE 386852L END")
    val perq = top
      .join(labels.select(col("vec_id").as("qid"),
        col("label").as("true_label")), Seq("qid"))
      .join(labels.select(col("vec_id").as("doc_id"),
        col("label").as("n_label")), Seq("doc_id"))
      .groupBy("qid", "true_label")
      .agg(sum(when(col("n_label") === col("true_label"), gain)
        .otherwise(0L)).cast(LongType).as("dcg_micros"))
    perq
      .join(labelCnt.withColumnRenamed("label", "true_label"),
        Seq("true_label"))
      .filter(col("c_lbl") > 1)
      .withColumn("idcg_micros",
        expr("CASE least(c_lbl - 1, 5) WHEN 1 THEN 1000000L " +
          "WHEN 2 THEN 1630929L WHEN 3 THEN 2130929L " +
          "WHEN 4 THEN 2561605L ELSE 2948457L END"))
      .withColumn("ndcg_permille",
        expr("(dcg_micros * 1000) div idcg_micros").cast(LongType))
      .groupBy(col("true_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        expr("sum(ndcg_permille) div count(1)").cast(LongType)
          .as("avg_ndcg_permille"),
        sum(when(col("ndcg_permille") === 1000L, 1L).otherwise(0L))
          .cast(LongType).as("n_perfect"))
      .orderBy("label")
  }

  /** q_rrf_fusion — reciprocal-rank-fusion hybrid retrieval (Cormack
    * et al. 2009, the standard score-free fusion rule): per probe, the
    * dense exact-cosine top-3 ([[Similarity.qAnnTopk]]'s channel) and
    * the sparse tf-idf top-5 ([[sparseTopK]]) merge by
    * Σ 1/(60+rank) — here exact-integer micros, `1000000 div (60+r)`,
    * absent channels contributing zero — and the fused top-3 is
    * re-ranked on that score. RRF needs NO score calibration between
    * channels (only ranks enter), which is why it is the default
    * hybrid in production retrieval stacks; this is the operator the
    * X73/X134 single-channel scorecards argue for.
    *
    * Scale shape: both channels arrive pre-truncated (top-k per
    * probe), so fusion joins two probe×k-sized frames on
    * (probe, doc) — candidate-sized, never corpus-sized — and the
    * re-rank window partitions on the probe key. */
  val qRrfFusion: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val dense = Similarity.qAnnTopk(s, d)
      .select(col("qid"), col("nid").as("doc_id"), col("rnk").as("rd"))
    val sparse = sparseTopK(s, d, nProbes = 8)
      .select(col("qid"), col("doc_id"), col("rnk").as("rs"))
    val fused = dense.join(sparse, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf_micros",
        (coalesce(expr("1000000 div (60 + rd)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rs)"), lit(0L))).cast(LongType))
    val w = Window.partitionBy("qid").orderBy(col("rrf_micros").desc, col("doc_id"))
    fused.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 3)
      .select("qid", "rnk", "doc_id", "rrf_micros")
      .orderBy("qid", "rnk")
  }

  /** q_rank_overlap — ranking drift between two corpus halves
    * (doc_id parity): each half's top-20 terms by frequency under the
    * (count desc, term) total order, then overlap@k and Jaccard@k in
    * permille for k ∈ {1, 5, 10, 20}. The distribution-shift smoke
    * alarm: two snapshots of a healthy corpus share their head terms,
    * and WHERE the overlap curve collapses says how deep the drift
    * reaches (head churn = scrape change; tail churn = normal noise).
    *
    * Plan: the (half, term) counts prune through a two-phase top-k —
    * local row_number inside 32 hash buckets first (any term in a
    * half's global top-20 is in its bucket's top-20 under the same
    * total order, so the prune is lossless), then the global window
    * runs over ≤ 640 survivors per half instead of the vocabulary.
    * The oracle runs the naive full-vocabulary window — hash equality
    * IS the losslessness proof (the decomposition-proof pattern). The
    * k-spine joins a ≤20-row frame; nothing downstream is
    * corpus-sized. */
  val qRankOverlap: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.spread(Tables.documents(s, d).filter(col("text").isNotNull))
      .select((col("doc_id") % 2).cast(LongType).as("half"),
        explode(filter(split(col("text"), " "), w => length(w) > 0)).as("w"))
      .groupBy("half", "w").agg(count(lit(1)).as("n"))
    val wLocal = Window.partitionBy("half", "b").orderBy(col("n").desc, col("w"))
    val pruned = counts
      .withColumn("b", pmod(hash(col("w")), lit(32)))
      .withColumn("lr", row_number().over(wLocal))
      .filter(col("lr") <= 20).drop("b", "lr")
    val wHalf = Window.partitionBy("half").orderBy(col("n").desc, col("w"))
    val top = pruned
      .withColumn("r", row_number().over(wHalf).cast(LongType))
      .filter(col("r") <= 20)
    val joined = top.filter(col("half") === 0).select(col("w"), col("r").as("ra"))
      .join(top.filter(col("half") === 1).select(col("w"), col("r").as("rb")),
        Seq("w"))
    val ks = s.createDataFrame(Seq(Tuple1(1L), Tuple1(5L), Tuple1(10L), Tuple1(20L)))
      .toDF("k")
    ks.join(broadcast(joined), col("ra") <= col("k") && col("rb") <= col("k"), "left")
      .groupBy("k")
      .agg(count(col("w")).cast(LongType).as("n_overlap"))
      .withColumn("jaccard_permille",
        expr("(n_overlap * 1000) div (2 * k - n_overlap)").cast(LongType))
      .orderBy("k")
  }

  /** The truncated-RBO depth weights, ppm: (1−p)·p^(d−1)/(1−p¹⁰) at
    * p = 0.9 for d = 1..10, PINNED as literals so both engines use the
    * identical integers (no float pow at query time — the same
    * pinned-constant determinism as the r11 LSH bits). */
  private[operators] val rboWeightPpm = Seq(
    153533L, 138180L, 124362L, 111926L, 100733L,
    90660L, 81594L, 73434L, 66091L, 59482L)

  /** q_rbo_rankings — Rank-Biased Overlap (Webber, Moffat & Zobel
    * 2010) at depth 10, p = 0.9, between two per-source document
    * rankings: token count vs character count (each desc, doc_id
    * tiebreak). The TOP-WEIGHTED agreement readout the Kendall audit
    * (X229) cannot give: tau weighs all pairs equally, but a filter
    * cares about the head of the ranking — two signals can agree on
    * the corpus and still pick different top-10s. RBO@10 =
    * Σ_d w_d · |A∩B @ d| / d with the geometric weights pinned in
    * [[rboWeightPpm]]; per-depth terms are (ppm·overlap) div d —
    * non-negative integer division, floor-consistent.
    *
    * Shape: two per-source row_number windows pruned to rank ≤ 10
    * (source-partition windows — the [[Ranking.groupedRowNumber]]
    * range-bucketed form is the swap if sources are few and huge),
    * one ≤10-row-per-source self-join on doc_id, and a 10-term
    * conditional rollup. Everything after the scan is
    * 10·|sources| rows. */
  val qRboRankings: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, d)
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(col("source"), col("doc_id"),
        Packing.wsTokens(col("text")).as("nt"),
        col("n_chars").cast(LongType).as("len"))
    val wA = Window.partitionBy("source").orderBy(col("nt").desc, col("doc_id"))
    val wB = Window.partitionBy("source").orderBy(col("len").desc, col("doc_id"))
    val ranked = base
      .withColumn("ra", row_number().over(wA).cast(LongType))
      .withColumn("rb", row_number().over(wB).cast(LongType))
      .filter(col("ra") <= 10 || col("rb") <= 10)
      .localCheckpoint() // both sides of the match join
    // bounded self-join (≤10 rows/source each side): broadcast-hinted
    // per the r12 rule — size stats do not shrink through filters
    val matches = ranked.filter(col("ra") <= 10)
      .select(col("source"), col("doc_id"), col("ra"))
      .join(broadcast(ranked.filter(col("rb") <= 10)
        .select(col("source"), col("doc_id"), col("rb"))),
        Seq("source", "doc_id"))
      .withColumn("dmin", greatest(col("ra"), col("rb")))
    val ovCols = (1 to 10).map(dd =>
      sum(when(col("dmin") <= dd, 1L).otherwise(0L)).as(s"ov$dd"))
    val agg = matches.groupBy("source").agg(ovCols.head, ovCols.tail: _*)
    // left join from the source list: a pair of DISJOINT top-10s is a
    // legal (and interesting) zero row, not a missing one
    base.select("source").distinct()
      .join(agg, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("ov10"), lit(0L)).cast(LongType).as("overlap_10"),
        coalesce(rboWeightPpm.zipWithIndex.map { case (w, i) =>
          expr(s"($w * ov${i + 1}) div ${i + 1}")
        }.reduce(_ + _), lit(0L)).cast(LongType).as("rbo_ppm"))
      .orderBy("source")
  }

  /** q_winsorized_mean — robust per-source length profile: the raw
    * mean of n_chars next to the P5/P95-winsorized mean (values
    * outside the exact percentile fences CLAMP to them, the standard
    * winsorization) and the clamp count. The robust-stats companion
    * to [[qMadOutliers]]: MAD FLAGS the tail, winsorization prices
    * what the tail does to the mean — a 2× gap between the two means
    * is the "this source's average is a few giant documents" readout
    * a mixture designer needs before trusting any length-weighted
    * statistic.
    *
    * Exact: fences are percentile_disc (the [[Reports.qQuantiles]]
    * pinned discrete-quantile rule — both engines pick the smallest
    * value with cumulative share ≥ p, no interpolation), means are
    * floored milli via non-negative integer division. Two passes over
    * the (source, v) rollup: one aggregate for fences+raw sums, one
    * clamp+sum join back (source-keyed, co-partitioned). */
  val qWinsorizedMean: Q = (s, d) => {
    def pd(p: String) = expr(
      s"CAST(percentile_disc($p) WITHIN GROUP (ORDER BY v) AS BIGINT)")
    val base = Tables.documents(s, d)
      .filter(col("n_chars").isNotNull)
      .select(col("source"), col("n_chars").cast(LongType).as("v"))
    val fences = base.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum("v").cast(LongType).as("sum_raw"),
        pd("0.05").as("p05"), pd("0.95").as("p95"))
    base.join(fences, "source")
      .withColumn("w", least(greatest(col("v"), col("p05")), col("p95")))
      .groupBy("source", "n", "sum_raw", "p05", "p95")
      .agg(sum("w").cast(LongType).as("sum_w"),
        sum(when(col("v") < col("p05") || col("v") > col("p95"), 1L)
          .otherwise(0L)).cast(LongType).as("n_clamped"))
      .select(col("source"), col("n").cast(LongType).as("n"),
        col("p05"), col("p95"),
        expr("(sum_raw * 1000) div n").cast(LongType).as("mean_milli"),
        expr("(sum_w * 1000) div n").cast(LongType)
          .as("winsor_mean_milli"),
        col("n_clamped"))
      .orderBy("source")
  }

  val queries: Map[String, Q] = Map(
    "q_winsorized_mean" -> qWinsorizedMean,
    "q_rbo_rankings" -> qRboRankings,
    "q_rank_overlap" -> qRankOverlap,
    "q_rrf_fusion" -> qRrfFusion,
    "q_bm25" -> qBm25,
    "q_sparse_cosine" -> qSparseCosine,
    "q_retrieval_eval" -> qRetrievalEval,
    "q_ndcg" -> qNdcg,
    "q_mad_outliers" -> qMadOutliers,
    "q_dup_by_source" -> qDupBySource,
    "q_datasheet" -> qDatasheet)

  val oracle: Map[String, String] = Map(
    "q_winsorized_mean" ->
      """WITH base AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |fences AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS BIGINT) AS sum_raw,
        |    CAST(quantile_disc(v, 0.05) AS BIGINT) AS p05,
        |    CAST(quantile_disc(v, 0.95) AS BIGINT) AS p95
        |  FROM base GROUP BY source)
        |SELECT f.source, f.n, f.p05, f.p95,
        |  CAST((f.sum_raw * 1000) // f.n AS BIGINT) AS mean_milli,
        |  CAST((SUM(LEAST(GREATEST(b.v, f.p05), f.p95)) * 1000) // f.n
        |    AS BIGINT) AS winsor_mean_milli,
        |  CAST(SUM(CASE WHEN b.v < f.p05 OR b.v > f.p95 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clamped
        |FROM base b JOIN fences f USING (source)
        |GROUP BY f.source, f.n, f.p05, f.p95, f.sum_raw
        |ORDER BY f.source""".stripMargin,
    "q_rbo_rankings" -> {
      val terms = rboWeightPpm.zipWithIndex.map { case (w, i) =>
        s"($w * ov${i + 1}) // ${i + 1}"
      }.mkString(" + ")
      val ovs = (1 to 10).map(dd =>
        s"SUM(CASE WHEN dmin <= $dd THEN 1 ELSE 0 END) AS ov$dd")
        .mkString(",\n    ")
      s"""WITH base AS (
        |  SELECT source, doc_id,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS nt,
        |    CAST(n_chars AS BIGINT) AS len
        |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
        |ranked AS (
        |  SELECT source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY nt DESC, doc_id) AS ra,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY len DESC, doc_id) AS rb
        |  FROM base),
        |matches AS (
        |  SELECT a.source, GREATEST(a.ra, b.rb) AS dmin
        |  FROM (SELECT source, doc_id, ra FROM ranked WHERE ra <= 10) a
        |  JOIN (SELECT source, doc_id, rb FROM ranked WHERE rb <= 10) b
        |    USING (source, doc_id)),
        |agg AS (
        |  SELECT source,
        |    $ovs
        |  FROM matches GROUP BY source)
        |SELECT s.source,
        |  CAST(COALESCE(agg.ov10, 0) AS BIGINT) AS overlap_10,
        |  CAST(COALESCE($terms, 0) AS BIGINT) AS rbo_ppm
        |FROM (SELECT DISTINCT source FROM base) s
        |LEFT JOIN agg USING (source)
        |ORDER BY source""".stripMargin
    },
    "q_rank_overlap" ->
      // naive single full-vocabulary window per half ON PURPOSE: hash
      // equality proves the engine's bucketed two-phase top-k prune
      // drops nothing
      """WITH words AS (
        |  SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |counts AS (
        |  SELECT half, w, COUNT(*) AS n FROM words
        |  WHERE length(w) > 0 GROUP BY half, w),
        |ranked AS (
        |  SELECT half, w,
        |    CAST(row_number() OVER (PARTITION BY half ORDER BY n DESC, w)
        |      AS BIGINT) AS r
        |  FROM counts),
        |top AS (SELECT * FROM ranked WHERE r <= 20),
        |j AS (
        |  SELECT a.w, a.r AS ra, b.r AS rb
        |  FROM top a JOIN top b ON a.w = b.w AND a.half = 0 AND b.half = 1),
        |ks AS (SELECT CAST(unnest([1, 5, 10, 20]) AS BIGINT) AS k)
        |SELECT k, CAST(COUNT(j.w) AS BIGINT) AS n_overlap,
        |  CAST((COUNT(j.w) * 1000) // (2 * k - COUNT(j.w)) AS BIGINT)
        |    AS jaccard_permille
        |FROM ks LEFT JOIN j ON j.ra <= k AND j.rb <= k
        |GROUP BY k ORDER BY k""".stripMargin,
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
    "q_rrf_fusion" ->
      """WITH el AS (
        |  SELECT vec_id, i, CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,8)) AS x
        |  FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS i
        |        FROM embeddings)),
        |nrm AS (SELECT vec_id, SUM(x*x) AS nrm FROM el GROUP BY vec_id),
        |ddots AS (
        |  SELECT q.vec_id AS qid, e.vec_id AS nid, SUM(q.x * e.x) AS dot
        |  FROM el q JOIN el e ON q.i = e.i AND q.vec_id < 8 AND e.vec_id <> q.vec_id
        |  GROUP BY q.vec_id, e.vec_id),
        |cosv AS (
        |  SELECT qid, nid,
        |    CAST(CAST(CAST(dot AS DOUBLE) / sqrt(CAST(nq.nrm AS DOUBLE) * CAST(ne.nrm AS DOUBLE)) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS sim_micros
        |  FROM ddots
        |  JOIN nrm nq ON qid = nq.vec_id
        |  JOIN nrm ne ON nid = ne.vec_id),
        |dense AS (
        |  SELECT qid, nid AS doc_id, rnk AS rd
        |  FROM (SELECT qid, nid, sim_micros,
        |          CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_micros DESC, nid) AS BIGINT) AS rnk
        |        FROM cosv)
        |  WHERE rnk <= 3),
        |tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(word) > 0 GROUP BY doc_id, word),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL),
        |dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
        |wtab AS (
        |  SELECT t.doc_id, t.word,
        |    CAST(t.tf * (((nd.n_docs - f.df + 1) * 1000) // (f.df + 1)) AS BIGINT) AS w
        |  FROM tf t JOIN dfreq f ON t.word = f.word, nd),
        |norms AS (
        |  SELECT doc_id, CAST(SUM(w * w) AS DOUBLE) AS nrm FROM wtab GROUP BY doc_id),
        |sdots AS (
        |  SELECT p.doc_id AS qid, c.doc_id, CAST(SUM(p.w * c.w) AS BIGINT) AS dot
        |  FROM wtab p JOIN wtab c ON p.word = c.word
        |  WHERE p.doc_id < 8 AND c.doc_id <> p.doc_id
        |  GROUP BY 1, 2),
        |ssim AS (
        |  SELECT d.qid, d.doc_id,
        |    CAST(CAST(CAST(d.dot AS DOUBLE) / sqrt(nq.nrm * nc.nrm) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS sim_micros
        |  FROM sdots d
        |  JOIN norms nq ON d.qid = nq.doc_id
        |  JOIN norms nc ON d.doc_id = nc.doc_id),
        |sparse AS (
        |  SELECT qid, doc_id, rnk AS rs FROM (
        |    SELECT qid, doc_id, sim_micros,
        |      CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_micros DESC, doc_id)
        |        AS BIGINT) AS rnk
        |    FROM ssim)
        |  WHERE rnk <= 5),
        |fused AS (
        |  SELECT COALESCE(dense.qid, sparse.qid) AS qid,
        |    COALESCE(dense.doc_id, sparse.doc_id) AS doc_id,
        |    CAST(COALESCE(1000000 // (60 + rd), 0)
        |       + COALESCE(1000000 // (60 + rs), 0) AS BIGINT) AS rrf_micros
        |  FROM dense FULL OUTER JOIN sparse
        |    ON dense.qid = sparse.qid AND dense.doc_id = sparse.doc_id)
        |SELECT qid, rnk, doc_id, rrf_micros FROM (
        |  SELECT qid, doc_id, rrf_micros,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf_micros DESC, doc_id)
        |      AS BIGINT) AS rnk
        |  FROM fused)
        |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    "q_retrieval_eval" ->
      """WITH tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(word) > 0 GROUP BY doc_id, word),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL),
        |dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
        |wtab AS (
        |  SELECT t.doc_id, t.word,
        |    CAST(t.tf * (((nd.n_docs - f.df + 1) * 1000) // (f.df + 1)) AS BIGINT) AS w
        |  FROM tf t JOIN dfreq f ON t.word = f.word, nd),
        |norms AS (
        |  SELECT doc_id, CAST(SUM(w * w) AS DOUBLE) AS nrm FROM wtab GROUP BY doc_id),
        |dots AS (
        |  SELECT p.doc_id AS qid, c.doc_id, CAST(SUM(p.w * c.w) AS BIGINT) AS dot
        |  FROM wtab p JOIN wtab c ON p.word = c.word
        |  WHERE p.doc_id < 64 AND c.doc_id <> p.doc_id
        |  GROUP BY 1, 2),
        |sim AS (
        |  SELECT d.qid, d.doc_id,
        |    CAST(CAST(CAST(d.dot AS DOUBLE) / sqrt(nq.nrm * nc.nrm) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS sim_micros
        |  FROM dots d
        |  JOIN norms nq ON d.qid = nq.doc_id
        |  JOIN norms nc ON d.doc_id = nc.doc_id),
        |top AS (
        |  SELECT qid, rnk, doc_id FROM (
        |    SELECT qid, doc_id, sim_micros,
        |      CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_micros DESC, doc_id)
        |        AS BIGINT) AS rnk
        |    FROM sim)
        |  WHERE rnk <= 5),
        |lbl AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |perq AS (
        |  SELECT t.qid, ql.label AS true_label,
        |    MIN(CASE WHEN nl.label = ql.label THEN t.rnk END) AS fc,
        |    MAX(CASE WHEN t.rnk = 1 AND nl.label = ql.label THEN 1 ELSE 0 END) AS p1
        |  FROM top t
        |  JOIN lbl ql ON t.qid = ql.vec_id
        |  JOIN lbl nl ON t.doc_id = nl.vec_id
        |  GROUP BY t.qid, ql.label)
        |SELECT true_label AS label, COUNT(*) AS n_queries,
        |  CAST(SUM(p1) AS BIGINT) AS n_p1,
        |  CAST((SUM(p1) * 1000) // COUNT(*) AS BIGINT) AS p1_permille,
        |  CAST(SUM(COALESCE(1000 // fc, 0)) // COUNT(*) AS BIGINT) AS mrr_milli
        |FROM perq GROUP BY true_label ORDER BY true_label""".stripMargin,
    "q_ndcg" ->
      """WITH tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(word) > 0 GROUP BY doc_id, word),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL),
        |dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
        |wtab AS (
        |  SELECT t.doc_id, t.word,
        |    CAST(t.tf * (((nd.n_docs - f.df + 1) * 1000) // (f.df + 1)) AS BIGINT) AS w
        |  FROM tf t JOIN dfreq f ON t.word = f.word, nd),
        |norms AS (
        |  SELECT doc_id, CAST(SUM(w * w) AS DOUBLE) AS nrm FROM wtab GROUP BY doc_id),
        |dots AS (
        |  SELECT p.doc_id AS qid, c.doc_id, CAST(SUM(p.w * c.w) AS BIGINT) AS dot
        |  FROM wtab p JOIN wtab c ON p.word = c.word
        |  WHERE p.doc_id < 64 AND c.doc_id <> p.doc_id
        |  GROUP BY 1, 2),
        |sim AS (
        |  SELECT d.qid, d.doc_id,
        |    CAST(CAST(CAST(d.dot AS DOUBLE) / sqrt(nq.nrm * nc.nrm) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS sim_micros
        |  FROM dots d
        |  JOIN norms nq ON d.qid = nq.doc_id
        |  JOIN norms nc ON d.doc_id = nc.doc_id),
        |top AS (
        |  SELECT qid, rnk, doc_id FROM (
        |    SELECT qid, doc_id, sim_micros,
        |      CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_micros DESC, doc_id)
        |        AS BIGINT) AS rnk
        |    FROM sim)
        |  WHERE rnk <= 5),
        |lbl AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
        |lc AS (SELECT label, COUNT(*) AS c_lbl FROM lbl GROUP BY label),
        |perq AS (
        |  SELECT t.qid, ql.label AS true_label,
        |    CAST(SUM(CASE WHEN nl.label = ql.label THEN
        |      CASE t.rnk WHEN 1 THEN 1000000 WHEN 2 THEN 630929
        |        WHEN 3 THEN 500000 WHEN 4 THEN 430676 ELSE 386852 END
        |      ELSE 0 END) AS BIGINT) AS dcg_micros
        |  FROM top t
        |  JOIN lbl ql ON t.qid = ql.vec_id
        |  JOIN lbl nl ON t.doc_id = nl.vec_id
        |  GROUP BY t.qid, ql.label),
        |scored AS (
        |  SELECT p.true_label, p.dcg_micros,
        |    (p.dcg_micros * 1000) // (CASE LEAST(lc.c_lbl - 1, 5)
        |      WHEN 1 THEN 1000000 WHEN 2 THEN 1630929 WHEN 3 THEN 2130929
        |      WHEN 4 THEN 2561605 ELSE 2948457 END) AS ndcg_permille
        |  FROM perq p JOIN lc ON p.true_label = lc.label
        |  WHERE lc.c_lbl > 1)
        |SELECT true_label AS label, COUNT(*) AS n_queries,
        |  CAST(SUM(ndcg_permille) // COUNT(*) AS BIGINT) AS avg_ndcg_permille,
        |  CAST(SUM(CASE WHEN ndcg_permille = 1000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_perfect
        |FROM scored GROUP BY true_label ORDER BY true_label""".stripMargin,
    "q_sparse_cosine" ->
      """WITH tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(word) > 0 GROUP BY doc_id, word),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL),
        |dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
        |wtab AS (
        |  SELECT t.doc_id, t.word,
        |    CAST(t.tf * (((nd.n_docs - f.df + 1) * 1000) // (f.df + 1)) AS BIGINT) AS w
        |  FROM tf t JOIN dfreq f ON t.word = f.word, nd),
        |norms AS (
        |  SELECT doc_id, CAST(SUM(w * w) AS DOUBLE) AS nrm FROM wtab GROUP BY doc_id),
        |dots AS (
        |  SELECT p.doc_id AS qid, c.doc_id, CAST(SUM(p.w * c.w) AS BIGINT) AS dot
        |  FROM wtab p JOIN wtab c ON p.word = c.word
        |  WHERE p.doc_id < 8 AND c.doc_id <> p.doc_id
        |  GROUP BY 1, 2),
        |sim AS (
        |  SELECT d.qid, d.doc_id,
        |    CAST(CAST(CAST(d.dot AS DOUBLE) / sqrt(nq.nrm * nc.nrm) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS sim_micros
        |  FROM dots d
        |  JOIN norms nq ON d.qid = nq.doc_id
        |  JOIN norms nc ON d.doc_id = nc.doc_id)
        |SELECT qid, rnk, doc_id, sim_micros FROM (
        |  SELECT qid, doc_id, sim_micros,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_micros DESC, doc_id)
        |      AS BIGINT) AS rnk
        |  FROM sim)
        |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
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
