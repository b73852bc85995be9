package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables

/** Index-layout and cross-modal planning statistics.
  *
  * Operators a pipeline owner runs BEFORE committing to a storage or
  * tokenizer layout: the vocabulary-coverage curve (how much of the
  * corpus the top-k types buy — the tokenizer-vocab ROI table),
  * posting-list gap statistics (how compressible the inverted index's
  * delta encoding will be), and the documents⋈embeddings cross-modal
  * join that checks text-side and vector-side health signals against
  * each other.
  */
object IndexStats {

  type Q = (SparkSession, String) => DataFrame

  /** q_coverage_curve — tokenizer-vocab ROI: vocabulary ranked by
    * corpus frequency (count DESC, word ASC — pinned ties), with the
    * cumulative token share each prefix of the ranking covers, in
    * permille, for the top 20 types. Vocab-size decisions read off
    * this curve ("top 8 types already cover 61% of tokens").
    *
    * Plan: one wordcount aggregate, then the [[graft.operators
    * .Relevance.qRankOverlap]] two-phase lossless top-k — local
    * row_number inside 32 hash buckets (any word in the global top-20
    * under the (n DESC, word) total order is in its bucket's top-20
    * under the same order), so the global rank+cumsum window runs over
    * ≤ 640 survivors, never the vocabulary (web-scale vocabularies are
    * O(10⁹) types — the r9 "weak" flag). cum_n is exact on the pruned
    * frame: for rank ≤ 20 the running-sum prefix is exactly the global
    * top-rank words, all of which survive the prune. The oracle runs
    * the naive full-vocabulary window — hash equality IS the
    * losslessness proof. Total-token count broadcasts as a scalar
    * row. */
  val qCoverageCurve: Q = (s, d) => {
    // corpus type counts roll up from the memoized TextStats spine
    // (r16); still checkpointed — it feeds the total AND the prune
    val counts = TextStats.sourceWordCounts(s, d)
      .groupBy(col("w").as("word")).agg(sum("c").cast(LongType).as("n"))
      .localCheckpoint()
    val total = counts.agg(sum("n").as("n_total"))
    val wLocal = Window.partitionBy("b").orderBy(col("n").desc, col("word"))
    val pruned = counts
      .withColumn("b", pmod(hash(col("word")), lit(32)))
      .withColumn("lr", row_number().over(wLocal))
      .filter(col("lr") <= 20).drop("b", "lr")
    val w = Window.orderBy(col("n").desc, col("word"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.orderBy(col("n").desc, col("word"))
    pruned
      .withColumn("rank", row_number().over(wr).cast(LongType))
      .withColumn("cum_n", sum(col("n")).over(w).cast(LongType))
      .filter(col("rank") <= 20)
      .crossJoin(broadcast(total))
      .select(col("rank"), col("word"), col("n").cast(LongType).as("n"),
        col("cum_n"),
        expr("(cum_n * 1000) div n_total").cast(LongType).as("cum_permille"))
      .orderBy("rank")
  }

  /** q_posting_gaps — delta-encoding compressibility of the inverted
    * index: per term (df ≥ 3), the doc_id gap statistics of its
    * posting list — mean gap (micro-scaled), max gap, and the share of
    * gaps ≤ 16 in permille (the fraction that fits a 4-bit delta).
    * Long skinny gaps mean a term is corpus-spread (poor block
    * compression); dense runs mean clustered postings (golomb/PFor
    * friendly). This is the layout-planning twin of X36's index build.
    *
    * Plan: distinct (word, doc_id) collapses map-side; gaps are a lag
    * window on the word key (high-cardinality, skew-free); the stats
    * are a per-word aggregate over the same exchange. */
  val qPostingGaps: Q = (s, d) => {
    val postings = Tables.spread(Tables.documents(s, d).filter(col("text").isNotNull))
      .select(explode(split(col("text"), " ")).as("word"), col("doc_id"))
      .filter(length(col("word")) >= 3)
      .distinct()
    val w = Window.partitionBy("word").orderBy("doc_id")
    postings
      .withColumn("gap", (col("doc_id") - lag(col("doc_id"), 1).over(w)).cast(LongType))
      .filter(col("gap").isNotNull)
      .groupBy("word")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).cast(LongType).as("sum_gap"),
        max(col("gap")).cast(LongType).as("max_gap"),
        sum(when(col("gap") <= 16, 1L).otherwise(0L)).cast(LongType).as("n_small"))
      .filter(col("n_gaps") >= 2)
      .withColumn("mean_gap_micro",
        expr("(sum_gap * 1000000) div n_gaps").cast(LongType))
      .withColumn("small_permille",
        expr("(n_small * 1000) div n_gaps").cast(LongType))
      .select("word", "n_gaps", "mean_gap_micro", "max_gap", "small_permille")
      .orderBy("word")
  }

  /** q_crossmodal_health — documents ⋈ embeddings on the shared id:
    * per language, doc count, mean length, and the mean squared
    * embedding norm on the repo's micros grid (floor(‖v‖²·10⁶), the
    * [[Similarity.qEmbeddingNorms]] contract). A text-side slice
    * whose vectors run hot or cold (norm drift) was embedded wrong —
    * the cheapest cross-modal consistency check there is, and the
    * reason the two tables share an id space.
    *
    * Plan: one equi-join on the id (both sides id-partitioned — at
    * 100 TB this is the co-partitioned join the shared key exists
    * for), norms computed scan-side via the codegen'd exact dot, then
    * a |langs|-group aggregate. */
  val qCrossmodalHealth: Q = (s, d) => {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def decVec(e: org.apache.spark.sql.Column) =
      transform(e, x => x.cast(DoubleType).cast(org.apache.spark.sql.types.DecimalType(12, 8)))
    def decDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.functions.DecimalDotExpr(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val vecs = Tables.embeddings(s, d)
      .select(col("vec_id"),
        floor(decDot(decVec(col("embedding")), decVec(col("embedding")))
          * lit(1000000L)).cast(LongType).as("nrm_u"))
    docs.join(vecs, docs("doc_id") === vecs("vec_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast(LongType).as("sum_chars"),
        sum(col("nrm_u")).cast(LongType).as("sum_nrm_u"))
      .withColumn("mean_chars", expr("sum_chars div n_docs").cast(LongType))
      .withColumn("mean_nrm_u", expr("sum_nrm_u div n_docs").cast(LongType))
      .select("lang", "n_docs", "mean_chars", "mean_nrm_u")
      .orderBy("lang")
  }

  /** q_delta_encoding — posting-list compression planning: every
    * word's doc_id list delta-encodes (gap from the previous posting,
    * first gap from 0), each gap's varint cost is ⌈bitlen/7⌉ bytes
    * (`(length(bin(gap)) + 6) div 7` — integer string algebra, the
    * [[TextStats.qLogHistogram]] trick), and lists roll up by
    * log₂-length band: words per band, total postings, fixed 8-byte
    * cost vs varint cost, and the ratio in permille. This is THE
    * index-layout table — long posting lists (dense, small gaps)
    * compress hardest, and the band curve tells an index designer
    * where bit-packing/PForDelta pays before building anything.
    *
    * Plan: the postings scan + one word-keyed window for gaps (same
    * exchange the per-word aggregate reuses), then a ≤⌈log₂ n⌉-group
    * rollup — map-side collapse, constant-width final shuffle. */
  val qDeltaEncoding: Q = (s, d) => {
    val postings = Tables.spread(Tables.documents(s, d).filter(col("text").isNotNull))
      .select(explode(split(col("text"), " ")).as("word"), col("doc_id"))
      .filter(length(col("word")) >= 3)
      .distinct()
    val w = Window.partitionBy("word").orderBy("doc_id")
    val perWord = postings
      .withColumn("gap",
        (col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w), lit(0L)))
          .cast(LongType))
      .withColumn("vbytes",
        expr("(length(bin(gap)) + 6) div 7").cast(LongType))
      .groupBy("word")
      .agg(count(lit(1)).as("n_postings"),
        sum(col("vbytes")).cast(LongType).as("v_bytes"))
    perWord
      .withColumn("band", length(bin(col("n_postings"))).cast(LongType))
      .groupBy("band")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_postings")).cast(LongType).as("n_postings"),
        (sum(col("n_postings")) * 8).cast(LongType).as("fixed_bytes"),
        sum(col("v_bytes")).cast(LongType).as("varint_bytes"))
      .withColumn("ratio_permille",
        expr("(varint_bytes * 1000) div fixed_bytes").cast(LongType))
      .orderBy("band")
  }

  /** q_phrase_search — exact phrase matching by POSITIONAL-POSTING
    * intersection, the inverted-index query plan every search engine
    * runs (Manning et al., IIR §2.4 positional postings): the corpus's
    * most frequent word trigram (rank pinned) is the phrase; matches
    * are found NOT by scanning text but by intersecting the three
    * words' posting lists with position offsets — p(w₁) ⋈ p(w₂)@pos−1
    * ⋈ p(w₃)@pos−2 on the (doc, pos) key. The DuckDB twin runs the
    * SCAN plan (every position probed against the phrase) — hash
    * equality proves the index-side rewrite IS the scan semantics.
    *
    * Plan: the phrase row broadcasts against the token stream (1-row
    * BNLJ = a broadcast filter — only the three phrase words survive
    * into postings, the selectivity step a real index gets from its
    * dictionary), then two (doc, pos)-keyed equi-joins on
    * posting-sized sides. High-cardinality keys, no skew (a posting
    * row is unique per (doc, pos)); at 100 TB the intersection costs
    * the postings of three words, not the corpus. */
  val qPhraseSearch: Q = (s, d) => {
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), ws.as("ws")).filter(size(col("ws")) >= 3)
    val tri = docs
      .withColumn("t2", slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))))
      .withColumn("t3", slice(col("ws"), lit(3), greatest(size(col("ws")) - 2, lit(0))))
      .select(explode(arrays_zip(col("ws"), col("t2"), col("t3"))).as("z"))
      .select(col("z.ws").as("w1"), col("z.t2").as("w2"), col("z.t3").as("w3"))
      .filter(col("w3").isNotNull)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1"), col("w2"), col("w3"))
      .limit(1).select("w1", "w2", "w3")
    val toks = Tables.spread(docs)
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "word")))
      .crossJoin(broadcast(tri))
    val p1 = toks.filter(col("word") === col("w1"))
      .select(col("doc_id"), col("pos"))
    val p2 = toks.filter(col("word") === col("w2"))
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    val p3 = toks.filter(col("word") === col("w3"))
      .select(col("doc_id"), (col("pos") - 2).as("pos"))
    p1.join(p2, Seq("doc_id", "pos")).join(p3, Seq("doc_id", "pos"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .crossJoin(broadcast(tri))
      .select(col("doc_id"), col("w1"), col("w2"), col("w3"), col("n_hits"))
      .orderBy(col("n_hits").desc, col("doc_id"))
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "q_phrase_search" -> qPhraseSearch,
    "q_coverage_curve" -> qCoverageCurve,
    "q_posting_gaps" -> qPostingGaps,
    "q_delta_encoding" -> qDeltaEncoding,
    "q_crossmodal_health" -> qCrossmodalHealth)

  val oracle: Map[String, String] = Map(
    "q_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |tri AS (
        |  SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3, COUNT(*) AS c
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i)
        |  WHERE len(ws) >= 3 GROUP BY 1, 2, 3
        |  ORDER BY c DESC, w1, w2, w3 LIMIT 1),
        |hits AS (
        |  SELECT doc_id, COUNT(*) AS n_hits
        |  FROM toks, tri, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i)
        |  WHERE len(ws) >= 3
        |    AND ws[i] = w1 AND ws[i+1] = w2 AND ws[i+2] = w3
        |  GROUP BY 1)
        |SELECT doc_id, w1, w2, w3, n_hits FROM hits, tri
        |ORDER BY n_hits DESC, doc_id LIMIT 20""".stripMargin,
    "q_delta_encoding" ->
      """WITH postings AS (
        |  SELECT DISTINCT word, doc_id FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word, doc_id
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(word) >= 3),
        |gaps AS (
        |  SELECT word,
        |    doc_id - COALESCE(lag(doc_id) OVER (PARTITION BY word ORDER BY doc_id),
        |                      0) AS gap
        |  FROM postings),
        |per_word AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_postings,
        |    CAST(SUM((length(bin(gap)) + 6) // 7) AS BIGINT) AS v_bytes
        |  FROM gaps GROUP BY word)
        |SELECT CAST(length(bin(n_postings)) AS BIGINT) AS band,
        |  COUNT(*) AS n_words,
        |  CAST(SUM(n_postings) AS BIGINT) AS n_postings,
        |  CAST(SUM(n_postings) * 8 AS BIGINT) AS fixed_bytes,
        |  CAST(SUM(v_bytes) AS BIGINT) AS varint_bytes,
        |  CAST((SUM(v_bytes) * 1000) // (SUM(n_postings) * 8) AS BIGINT)
        |    AS ratio_permille
        |FROM per_word GROUP BY 1 ORDER BY band""".stripMargin,
    "q_coverage_curve" ->
      """WITH counts AS (
        |  SELECT word, COUNT(*) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(word) > 0 GROUP BY word),
        |total AS (SELECT SUM(n) AS n_total FROM counts),
        |ranked AS (
        |  SELECT word, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT) AS rank,
        |    CAST(SUM(n) OVER (ORDER BY n DESC, word
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
        |  FROM counts)
        |SELECT rank, word, CAST(n AS BIGINT) AS n, cum_n,
        |  CAST((cum_n * 1000) // n_total AS BIGINT) AS cum_permille
        |FROM ranked, total WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "q_posting_gaps" ->
      """WITH postings AS (
        |  SELECT DISTINCT word, doc_id FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word, doc_id
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(word) >= 3),
        |gaps AS (
        |  SELECT word,
        |    doc_id - lag(doc_id) OVER (PARTITION BY word ORDER BY doc_id) AS gap
        |  FROM postings),
        |stats AS (
        |  SELECT word, COUNT(*) AS n_gaps,
        |    CAST(SUM(gap) AS BIGINT) AS sum_gap,
        |    CAST(MAX(gap) AS BIGINT) AS max_gap,
        |    CAST(SUM(CASE WHEN gap <= 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_small
        |  FROM gaps WHERE gap IS NOT NULL GROUP BY word)
        |SELECT word, n_gaps,
        |  CAST((sum_gap * 1000000) // n_gaps AS BIGINT) AS mean_gap_micro,
        |  max_gap,
        |  CAST((n_small * 1000) // n_gaps AS BIGINT) AS small_permille
        |FROM stats WHERE n_gaps >= 2 ORDER BY word""".stripMargin,
    "q_crossmodal_health" ->
      """WITH el AS (
        |  SELECT vec_id, CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,8)) AS x
        |  FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS i
        |        FROM embeddings)),
        |nrm AS (
        |  SELECT vec_id, CAST(floor(SUM(x * x) * 1000000) AS BIGINT) AS nrm_u
        |  FROM el GROUP BY vec_id),
        |j AS (
        |  SELECT d.lang, d.n_chars, n.nrm_u
        |  FROM documents d JOIN nrm n ON d.doc_id = n.vec_id
        |  WHERE d.text IS NOT NULL)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars,
        |  CAST(SUM(nrm_u) // COUNT(*) AS BIGINT) AS mean_nrm_u
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin)
}
