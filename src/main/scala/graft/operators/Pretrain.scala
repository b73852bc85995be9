package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.Exprs.md5Long

/** Pretraining-objective data preparation: the operators that turn a
  * cleaned corpus into model inputs.
  *
  * [[TextStats.qBpePairs]] learns the first merge candidate;
  * [[qBpeMerge]] here APPLIES it — the learn/apply pair is one round
  * of the BPE training loop. [[qSpanCorruption]] computes the T5-style
  * span-mask statistics a denoising objective needs. [[qVocabOverlap]]
  * measures cross-source lexical diversity — the datasheet number that
  * tells you whether two "different" sources are the same crawl twice.
  *
  * All three are scan-heavy and shuffle-light: per-document work is
  * embarrassingly parallel; the only exchanges are a tiny pair/vocab
  * aggregate and (for overlap) a word-keyed join.
  */
object Pretrain {

  type Q = (SparkSession, String) => DataFrame

  /** q_bpe_merge — apply the winning BPE merge: take the corpus's most
    * frequent adjacent character pair (the [[TextStats.qBpePairs]]
    * argmax, (count DESC, pair ASC) pinned) and rewrite every document
    * with that pair fused, reporting per-doc merge counts, the new
    * length, and the md5 of the rewritten text (pinning the REWRITE,
    * not just the counts). Left-to-right non-overlapping `replace` is
    * exactly BPE's greedy merge order, and both engines share it.
    *
    * Scale shape: learn = the map-side-collapsing pair aggregate +
    * TakeOrdered(1); apply = one broadcast scalar row onto a second
    * scan. One BPE round costs two scans of the corpus, which is why
    * production BPE trainers sample — and the sample is a one-line
    * [[Selection.qWeightedSample]] filter upstream. */
  val qBpeMerge: Q = (s, d) => {
    val top = Tables.spread(Tables.documents(s, d))
      .filter(length(col("text")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(text) - 1), i -> substr(text, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(1)
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .crossJoin(broadcast(top))
      .withColumn("merged", expr("replace(text, pair, '§')"))
      .select(col("doc_id"), col("pair"),
        (length(col("text")) - length(col("merged"))).cast(LongType).as("n_merges"),
        length(col("merged")).cast(LongType).as("new_len"),
        md5(col("merged")).as("new_md5"))
      .orderBy("doc_id")
  }

  /** q_span_corruption — T5-style span-mask statistics (Raffel et al.
    * 2020 §3.1.4): tokens group into spans of 3; a span is masked when
    * `md5Long(doc_id || '|' || span_idx) mod 10 = 0` (≈10% noise
    * density, deterministic — the same retry/partitioning-proof coin
    * as every sampling rule in this repo). Per document: token count,
    * masked-token count, masked-span count, and the noise density in
    * permille — the numbers a denoising-objective data loader must
    * agree on with the trainer.
    *
    * Scale shape: explode to (doc, pos) rows, one doc-keyed hash
    * aggregate; the span decision is scan-side arithmetic. */
  val qSpanCorruption: Q = (s, d) =>
    Tables.spread(Tables.documents(s, d).filter(col("text").isNotNull))
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), w => length(w) > 0)))
      .select(col("doc_id"), (col("pos") + 1).as("i"))
      .withColumn("span_idx", expr("(i - 1) div 3").cast(LongType))
      .withColumn("masked",
        (pmod(md5Long(concat(col("doc_id").cast("string"), lit("|"),
          col("span_idx").cast("string"))), lit(10L)) === 0).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("masked")).cast(LongType).as("n_masked"),
        countDistinct(when(col("masked") === 1, col("span_idx"))).as("n_spans"))
      .withColumn("mask_permille",
        expr("(n_masked * 1000) div n_tokens").cast(LongType))
      .orderBy("doc_id")

  /** q_vocab_overlap — cross-source lexical diversity: the pairwise
    * Jaccard of source VOCABULARIES (distinct word sets), in integer
    * permille. Two sources with near-identical vocabularies are the
    * same distribution under different names — double-counted mixture
    * weight, wasted epochs; this is the datasheet's source-redundancy
    * matrix.
    *
    * Scale shape: vocabulary explode collapses map-side to distinct
    * (source, word); intersections come from a word-keyed self-join —
    * the posting-list pattern, never |S|² full-vocab comparisons — and
    * the pair aggregate is |S|²-cell tiny. Per-source sizes broadcast
    * back onto the pair table. */
  val qVocabOverlap: Q = (s, d) => {
    // the memoized (source, w, c) spine's keys ARE the vocabulary —
    // distinct and checkpoint come for free (r16)
    val sv = TextStats.sourceWordCounts(s, d)
      .select(col("source"), col("w").as("word"))
    val sizes = sv.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = sv.as("a")
      .join(sv.as("b"), col("a.word") === col("b.word")
        && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))),
        Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))),
        Seq("src_b"))
      .withColumn("jaccard_permille",
        expr("(n_common * 1000) div (n_a + n_b - n_common)").cast(LongType))
      .select("src_a", "src_b", "n_a", "n_b", "n_common", "jaccard_permille")
      .orderBy("src_a", "src_b")
  }

  /** q_domain_mix_round — one fixed-point multiplicative-weights
    * rebalance of the per-source training mixture (the DoReMi move,
    * Xie et al. 2023, with the exponential update linearized so every
    * step is INTEGER): sources whose mean token surprisal under the
    * corpus unigram LM exceeds the corpus mean are up-weighted
    * (hard-for-the-reference-model domains get more mass), clamped to
    * [0.5×, 2×] per round, then renormalized to permille. Surprisal
    * stands in for the trained-proxy excess loss — same shape, no GPU.
    *
    * Exactness: per-word surprisal floors to micro-bits BEFORE any
    * sum ([[TextStats.qSourceKl]]'s proven per-term-floor contract);
    * source sums ride DECIMAL(38,0) (count×micros wraps int64 past
    * ~10¹² tokens); the signed excess is divided through the
    * additive-shift floor (+10⁹, ÷2000, −5·10⁵ — Spark `div`
    * truncates, DuckDB `//` floors, they agree only shifted
    * non-negative).
    *
    * Plan: one (source, word) count table feeds everything — a vocab
    * rollup for corpus word counts, an UNHINTED vocab join back (AQE
    * broadcasts small vocabularies, web-scale ones shuffle), a
    * |sources|-group rollup, and the renormalization window runs over
    * the |sources|-row result, not the corpus. */
  val qDomainMixRound: Q = (s, d) => {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val dec = DecimalType(38, 0)
    // the vocab rollup AND the join back read the memoized spine (r16)
    val sw = TextStats.sourceWordCounts(s, d).withColumnRenamed("c", "c_sw")
    val cw = sw.groupBy("w").agg(sum("c_sw").as("c_w"))
    val tot = cw.agg(sum("c_w").as("n_tot"))
    val sMic = cw.crossJoin(broadcast(tot))
      .select(col("w"), col("c_w"), col("n_tot"),
        floor(lit(1000000.0) *
          log2(col("n_tot").cast(DoubleType) / col("c_w")))
          .cast(LongType).as("s_mic"))
      .localCheckpoint() // two consumers: per-source and corpus sums
    val corpus = sMic
      .agg(sum(col("c_w").cast(dec) * col("s_mic")).cast(dec).as("c_sum"),
        max("n_tot").as("n_tot"))
      .select(expr("c_sum div n_tot").cast(LongType).as("corpus_micro"),
        col("n_tot"))
    val bySrc = sw.join(sMic.select("w", "s_mic"), Seq("w"))
      .groupBy("source")
      .agg(sum("c_sw").cast(LongType).as("n_tokens"),
        sum(col("c_sw").cast(dec) * col("s_mic")).cast(dec).as("s_sum"))
    bySrc.crossJoin(broadcast(corpus))
      .withColumn("surprisal_micro",
        expr("s_sum div n_tokens").cast(LongType))
      .withColumn("w0_permille",
        expr("(n_tokens * 1000) div n_tot").cast(LongType))
      .withColumn("excess_micro",
        (col("surprisal_micro") - col("corpus_micro")).cast(LongType))
      .withColumn("factor_permille",
        greatest(lit(500L), least(lit(2000L),
          lit(1000L) + (expr("(excess_micro + 1000000000) div 2000")
            - lit(500000L)))).cast(LongType))
      .withColumn("w1_raw", col("w0_permille") * col("factor_permille"))
      .withColumn("w1_permille",
        expr("(w1_raw * 1000) div (sum(w1_raw) over ())").cast(LongType))
      .select("source", "n_tokens", "w0_permille", "surprisal_micro",
        "excess_micro", "factor_permille", "w1_permille")
      .orderBy("source")
  }

  /** q_unimax_mix — UniMax epoch-capped budget allocation (Chung et
    * al., "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining", ICLR 2023): given
    * per-source token counts, a total token budget B = 1.2×corpus and
    * an epoch cap of 1.25 epochs per source, water-fill the budget —
    * every source gets an equal share except those whose cap binds,
    * whose surplus redistributes to the rest. The standard fix for
    * temperature sampling's pathology (tiny sources epoch'd into the
    * hundreds); emitted per source with the resulting epoch count in
    * milli-epochs.
    *
    * Distributed closed form, no sequential loop: sort sources
    * ascending by cap; i is capped iff capᵢ·(n−i+1) + prefixᵢ₋₁ ≤ B,
    * and that condition is PREFIX-CLOSED (caps ascend, so the LHS
    * difference (capᵢ₊₁−capᵢ)(n−i) ≥ 0 — once false, always false;
    * UnimaxSpec pins it against the sequential greedy). m = the last
    * capped index; uncapped sources get ⌊(B − Σ₁..m cap)/(n−m)⌋ with
    * the integer remainder distributed greedily: +1 to each of the
    * LAST rem sources in (cap, source) order (idx > n − rem), which
    * is exactly the per-source result of the sequential greedy and
    * provably respects every cap (the smallest uncapped cap exceeds
    * the rational share, so share+1 ≤ cap whenever rem > 0) — same
    * total AND same per-source split as the greedy, assigned
    * deterministically in ONE window pass over the |sources|-row
    * rollup (bounded by construction; the corpus-sized work is just
    * the token-count scan). Long-arithmetic bound: the capped-prefix
    * test multiplies cap × |sources|, exact while
    * total_tokens × 1.25 × n_sources < 2⁶³ — a 100 TB corpus
    * (~2.5×10¹³ tokens) stays exact to ~300k sources. */
  val qUnimaxMix: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .groupBy("source")
      .agg(sum(Packing.wsTokens(col("text"))).cast(LongType).as("n_tokens"))
    val budget = tok.agg(expr("(sum(n_tokens) * 1200) div 1000")
      .cast(LongType).as("b"))
    val wOrd = Window.orderBy("cap", "source") // |sources| rows
    val ordered = tok
      .withColumn("cap", expr("(n_tokens * 1250) div 1000"))
      .withColumn("idx", row_number().over(wOrd).cast(LongType))
      .withColumn("ns", count(lit(1)).over(Window.partitionBy()).cast(LongType))
      .withColumn("prefix_b", coalesce(sum("cap").over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(budget))
      .withColumn("is_capped",
        (col("cap") * (col("ns") - col("idx") + 1L) + col("prefix_b")
          <= col("b")).cast(LongType))
      .localCheckpoint() // feeds both the m rollup and the allocation
    val m = ordered.agg(
      coalesce(max(when(col("is_capped") === 1L, col("idx"))), lit(0L))
        .as("m"))
    val capSum = ordered.crossJoin(broadcast(m))
      .filter(col("idx") <= col("m"))
      .agg(coalesce(sum("cap"), lit(0L)).as("capsum"))
    ordered.crossJoin(broadcast(m)).crossJoin(broadcast(capSum))
      .withColumn("allocated",
        when(col("idx") <= col("m"), col("cap"))
          .otherwise(expr("(b - capsum) div (ns - m)")
            + when(col("idx") > col("ns")
                - expr("(b - capsum) % (ns - m)"), lit(1L))
              .otherwise(lit(0L))))
      .select(col("source"), col("n_tokens"),
        col("cap").cast(LongType).as("cap_tokens"),
        col("allocated").cast(LongType).as("allocated"),
        (col("idx") <= col("m")).cast(LongType).as("capped"),
        expr("(allocated * 1000) div n_tokens").cast(LongType)
          .as("epochs_milli"))
      .orderBy("source")
  }

  val queries: Map[String, Q] = Map(
    "q_unimax_mix" -> qUnimaxMix,
    "q_bpe_merge" -> qBpeMerge,
    "q_domain_mix_round" -> qDomainMixRound,
    "q_span_corruption" -> qSpanCorruption,
    "q_vocab_overlap" -> qVocabOverlap)

  val oracle: Map[String, String] = Map(
    "q_unimax_mix" ->
      """WITH tok AS (
        |  SELECT source,
        |    CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
        |      AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL GROUP BY source),
        |budget AS (SELECT (SUM(n_tokens) * 1200) // 1000 AS b FROM tok),
        |ordered AS (
        |  SELECT source, n_tokens, (n_tokens * 1250) // 1000 AS cap,
        |    ROW_NUMBER() OVER (ORDER BY (n_tokens * 1250) // 1000, source)
        |      AS idx,
        |    COUNT(*) OVER () AS ns,
        |    COALESCE(SUM((n_tokens * 1250) // 1000) OVER (
        |      ORDER BY (n_tokens * 1250) // 1000, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS prefix_b
        |  FROM tok),
        |cond AS (
        |  SELECT ordered.*, b,
        |    CASE WHEN cap * (ns - idx + 1) + prefix_b <= b
        |      THEN 1 ELSE 0 END AS is_capped
        |  FROM ordered CROSS JOIN budget),
        |mrow AS (
        |  SELECT COALESCE(MAX(CASE WHEN is_capped = 1 THEN idx END), 0) AS m
        |  FROM cond),
        |csum AS (
        |  SELECT COALESCE(SUM(cap), 0) AS capsum
        |  FROM cond CROSS JOIN mrow WHERE idx <= m),
        |alloc AS (
        |  SELECT c.source, c.n_tokens, c.cap, c.idx, c.ns, c.b, m.m, cs.capsum,
        |    (CASE WHEN c.idx <= m.m THEN c.cap
        |          ELSE (c.b - cs.capsum) // (c.ns - m.m)
        |           + (CASE WHEN c.idx > c.ns
        |                - ((c.b - cs.capsum) % (c.ns - m.m))
        |              THEN 1 ELSE 0 END) END) AS allocated
        |  FROM cond c CROSS JOIN mrow m CROSS JOIN csum cs)
        |SELECT source, n_tokens, CAST(cap AS BIGINT) AS cap_tokens,
        |  CAST(allocated AS BIGINT) AS allocated,
        |  CAST(CASE WHEN idx <= m THEN 1 ELSE 0 END AS BIGINT) AS capped,
        |  CAST((allocated * 1000) // n_tokens AS BIGINT) AS epochs_milli
        |FROM alloc ORDER BY source""".stripMargin,
    "q_domain_mix_round" ->
      """WITH words AS (
        |  SELECT source, w FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(w) > 0),
        |sw AS (SELECT source, w, COUNT(*) AS c_sw FROM words GROUP BY 1, 2),
        |cw AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_tot FROM cw),
        |smic AS (
        |  SELECT w, c_w,
        |    CAST(floor(1000000.0 *
        |      log2(CAST((SELECT n_tot FROM tot) AS DOUBLE) / c_w)) AS BIGINT)
        |      AS s_mic
        |  FROM cw),
        |corpus AS (
        |  SELECT CAST(SUM(CAST(c_w AS HUGEINT) * s_mic)
        |           // (SELECT n_tot FROM tot) AS BIGINT) AS corpus_micro
        |  FROM smic),
        |bysrc AS (
        |  SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_tokens,
        |    SUM(CAST(c_sw AS HUGEINT) * s_mic) AS s_sum
        |  FROM sw JOIN smic USING (w) GROUP BY source),
        |step AS (
        |  SELECT source, n_tokens,
        |    CAST((n_tokens * 1000) // (SELECT n_tot FROM tot) AS BIGINT)
        |      AS w0_permille,
        |    CAST(s_sum // n_tokens AS BIGINT) AS surprisal_micro,
        |    CAST(s_sum // n_tokens - (SELECT corpus_micro FROM corpus)
        |      AS BIGINT) AS excess_micro
        |  FROM bysrc),
        |f AS (
        |  SELECT *, GREATEST(500, LEAST(2000,
        |      1000 + ((excess_micro + 1000000000) // 2000 - 500000)))
        |      AS factor_permille
        |  FROM step),
        |r AS (SELECT *, w0_permille * factor_permille AS w1_raw FROM f)
        |SELECT source, n_tokens, w0_permille, surprisal_micro, excess_micro,
        |  CAST(factor_permille AS BIGINT) AS factor_permille,
        |  CAST((w1_raw * 1000) // (SUM(w1_raw) OVER ()) AS BIGINT)
        |    AS w1_permille
        |FROM r ORDER BY source""".stripMargin,
    "q_bpe_merge" ->
      """WITH pairs AS (
        |  SELECT substr(text, i, 2) AS pair
        |  FROM (SELECT text FROM documents WHERE length(text) >= 2),
        |       LATERAL (SELECT unnest(range(1, length(text))) AS i)),
        |top AS (
        |  SELECT pair FROM pairs GROUP BY pair
        |  ORDER BY COUNT(*) DESC, pair LIMIT 1)
        |SELECT doc_id, top.pair,
        |  CAST(length(text) - length(replace(text, top.pair, chr(167))) AS BIGINT)
        |    AS n_merges,
        |  CAST(length(replace(text, top.pair, chr(167))) AS BIGINT) AS new_len,
        |  md5(replace(text, top.pair, chr(167))) AS new_md5
        |FROM documents, top WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "q_span_corruption" ->
      """WITH toks AS (
        |  SELECT doc_id, (i - 1) // 3 AS span_idx,
        |    CASE WHEN CAST('0x' || substr(
        |        md5(CAST(doc_id AS VARCHAR) || '|' || CAST((i - 1) // 3 AS VARCHAR)),
        |        1, 15) AS BIGINT) % 10 = 0 THEN 1 ELSE 0 END AS masked
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(text, ' '), w -> length(w) > 0) AS wl
        |        FROM documents WHERE text IS NOT NULL),
        |       LATERAL (SELECT unnest(range(1, len(wl) + 1)) AS i))
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(masked) AS BIGINT) AS n_masked,
        |  COUNT(DISTINCT CASE WHEN masked = 1 THEN span_idx END) AS n_spans,
        |  CAST((SUM(masked) * 1000) // COUNT(*) AS BIGINT) AS mask_permille
        |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_vocab_overlap" ->
      """WITH sv AS (
        |  SELECT DISTINCT source, word FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS word
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE length(word) > 0),
        |sizes AS (SELECT source, COUNT(*) AS n FROM sv GROUP BY source),
        |inter AS (
        |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
        |  FROM sv a JOIN sv b ON a.word = b.word AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT i.src_a, i.src_b,
        |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
        |  CAST(i.n_common AS BIGINT) AS n_common,
        |  CAST((i.n_common * 1000) // (sa.n + sb.n - i.n_common) AS BIGINT)
        |    AS jaccard_permille
        |FROM inter i
        |JOIN sizes sa ON i.src_a = sa.source
        |JOIN sizes sb ON i.src_b = sb.source
        |ORDER BY i.src_a, i.src_b""".stripMargin)
}
