package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables

/** Corpus-hygiene operators a large-scale training-data pipeline runs
  * between crawling and training: PII detection/redaction, unigram-LM
  * perplexity scoring, tokenizer fertility, character-entropy spam
  * screening, and winnowing fingerprints for local (passage-level)
  * duplicate detection.
  *
  * Scale shape: everything except the unigram model is pure scan-side
  * column algebra over `documents` (whole-stage codegen, no UDFs, no
  * shuffle until the final aggregate/sort). The unigram LM is the one
  * genuinely global piece of state and it is vocabulary-sized, not
  * corpus-sized — it broadcast-joins back to the token stream, so the
  * per-document scoring pass never shuffles document data. Entropy and
  * winnowing work on per-document arrays with higher-order functions:
  * O(doc length) memory per row, embarrassingly parallel at 100 TB.
  *
  * Determinism contract with the DuckDB oracles: counts are exact
  * integers; every float (log2) is floored to a scaled integer PER TERM
  * before any summation, so aggregation order cannot change a result.
  */
object CorpusOps {

  type Q = (SparkSession, String) => DataFrame

  // The three PII shapes every scrubber starts with. The synthetic
  // corpus carries no real PII, so the query PLANTS deterministic
  // instances first (word-level replace, identical in the oracle) —
  // the detector/redactor machinery is then exercised on non-zero
  // counts instead of vacuously passing on an all-zero corpus.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private val PhoneRe = "\\+\\d[\\d-]{6,}"

  /** q_pii_scrub — detect and redact emails / IPv4s / phone numbers:
    * per-document match counts plus the md5 of the fully redacted text
    * (the hash pins the exact replacement semantics, not just counts).
    * One scan, three codegen'd regex passes, no shuffle but the sort. */
  val qPiiScrub: Q = (s, d) => {
    val pt = replace(
      replace(
        replace(col("text"), lit("table"), lit("bob@mail.com")),
        lit("scan"), lit("10.0.0.1")),
      lit("merge"), lit("+1-555-0182"))
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), pt.as("pt"))
      .select(
        col("doc_id"),
        regexp_count(col("pt"), lit(EmailRe)).cast(LongType).as("n_email"),
        regexp_count(col("pt"), lit(Ipv4Re)).cast(LongType).as("n_ipv4"),
        regexp_count(col("pt"), lit(PhoneRe)).cast(LongType).as("n_phone"),
        md5(regexp_replace(
          regexp_replace(
            regexp_replace(col("pt"), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>")).as("red_md5"))
      .orderBy("doc_id")
  }

  /** q_unigram_ppl — unigram language-model scoring (the CCNet-style
    * quality signal): build the corpus unigram distribution, score each
    * document by its total surprisal Σ −log2 p(w) and bits-per-token.
    *
    * Per-word surprisal is floored to milli-bits BEFORE the per-document
    * sum — summands are integers, so the result is independent of
    * aggregation order (and of Spark-vs-DuckDB float summation). The
    * model is vocabulary-sized: it broadcasts, the token stream never
    * shuffles for scoring, and the only wide exchange is the final
    * per-document combine (map-side partial agg collapses each scan
    * partition to its local doc set first). */
  val qUnigramPpl: Q = (s, d) => {
    val words = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val uni = words.groupBy("w").agg(count(lit(1)).as("n_w"))
    val total = uni.agg(sum("n_w").as("n_total"))
    val scored = uni.crossJoin(broadcast(total))
      .select(col("w"),
        floor(lit(1000) * log2(col("n_total").cast(DoubleType) / col("n_w")))
          .cast(LongType).as("s_milli"))
    words
      .join(broadcast(scored), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("s_milli").as("bits_milli"))
      .withColumn("bpt_milli", expr("bits_milli div n_tokens"))
      .orderBy("doc_id")
  }

  /** q_tokenizer_fertility — tokens-per-byte by language (the datasheet
    * number that says how expensive each language is to train on):
    * per-language document/token/byte totals and tokens-per-MB. Pure
    * scan + 5-group aggregate. */
  val qTokenizerFertility: Q = (s, d) => {
    val toks = size(filter(split(col("text"), " "), t => length(t) > 0))
      .cast(LongType)
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(toks).as("n_tokens"),
        sum(octet_length(col("text")).cast(LongType)).as("n_bytes"))
      .withColumn("fert_micro", expr("(1000000 * n_tokens) div n_bytes"))
      .orderBy("lang")
  }

  /** q_char_entropy — per-document character-level Shannon entropy (the
    * cheap spam/garbage screen: keyboard-mash and repeated-char docs
    * sit far below natural text). No explode: the per-document char
    * histogram is built with array higher-order functions inside the
    * scan — O(distinct chars × length) work per row, zero shuffle.
    * Entropy terms are floored to milli-bits per symbol class before
    * the sum (order-independent, oracle-exact). */
  val qCharEntropy: Q = (s, d) => {
    val cs = filter(split(col("text"), ""), x => length(x) > 0)
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), cs.as("cs"))
      .select(
        col("doc_id"),
        size(col("cs")).cast(LongType).as("n_chars_split"),
        size(array_distinct(col("cs"))).cast(LongType).as("n_distinct"),
        aggregate(
          transform(array_distinct(col("cs")), ch => {
            val p = size(filter(col("cs"), x => x === ch)).cast(DoubleType) /
              size(col("cs"))
            floor(lit(-1000.0) * p * log2(p)).cast(LongType)
          }),
          lit(0L), (acc, x) => acc + x).as("entropy_milli"))
      .orderBy("doc_id")
  }

  /** q_winnowing — winnowing document fingerprints (Schleimer et al.,
    * SIGMOD 2003: the robust local fingerprinting behind MOSS): hash
    * every word 3-gram, slide a window of 4 hashes, keep each window's
    * minimum — guaranteeing any shared passage of ≥ 6 words yields a
    * shared fingerprint — then report fingerprints shared across
    * documents. The hash is the md5 hex string itself (lexicographic
    * min), the one hash both engines compute identically.
    *
    * Fingerprint extraction is entirely scan-local array algebra; only
    * the deduplicated (doc, fingerprint) pairs reach the exchange, and
    * the shared-fingerprint aggregate is a plain two-phase count. */
  val qWinnowing: Q = (s, d) => {
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    // guards are structural, not just row filters: Spark may evaluate a
    // collapsed projection on rows an adjacent filter drops, and
    // sequence(1, n) with n<1 runs DESCENDING — so every sequence bound
    // is gated by a when() on the same condition the filter applies
    val grams3 = when(size(col("ws")) >= 6,
      transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => md5(concat(
          element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1), lit(" "),
          element_at(col("ws"), i + 2)))))
      .otherwise(array().cast("array<string>"))
    val winMins = when(size(col("hs")) >= 4,
      transform(
        sequence(lit(1), size(col("hs")) - 3),
        j => array_min(slice(col("hs"), j, lit(4)))))
      .otherwise(array().cast("array<string>"))
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= 6)
      .select(col("doc_id"), grams3.as("hs"))
      .select(col("doc_id"), array_distinct(winMins).as("fps"))
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("fp"))
      .limit(100)
  }

  val queries: Map[String, Q] = Map(
    "q_pii_scrub" -> qPiiScrub,
    "q_unigram_ppl" -> qUnigramPpl,
    "q_tokenizer_fertility" -> qTokenizerFertility,
    "q_char_entropy" -> qCharEntropy,
    "q_winnowing" -> qWinnowing)

  val oracle: Map[String, String] = Map(
    "q_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    replace(replace(replace(text, 'table', 'bob@mail.com'), 'scan', '10.0.0.1'),
        |            'merge', '+1-555-0182') AS pt
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |  len(regexp_extract_all(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(pt, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
        |  len(regexp_extract_all(pt, '\+\d[\d-]{6,}')) AS n_phone,
        |  md5(regexp_replace(regexp_replace(regexp_replace(pt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d[\d-]{6,}', '<PHONE>', 'g')) AS red_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_unigram_ppl" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |  WHERE text IS NOT NULL),
        |wf AS (SELECT doc_id, w FROM w WHERE length(w) > 0),
        |uni AS (SELECT w, COUNT(*) AS n_w FROM wf GROUP BY w),
        |tot AS (SELECT COUNT(*) AS n_total FROM wf),
        |sc AS (SELECT w, CAST(floor(1000 * log2(CAST(t.n_total AS DOUBLE) / u.n_w)) AS BIGINT) AS s_milli
        |       FROM uni u CROSS JOIN tot t)
        |SELECT wf.doc_id, COUNT(*) AS n_tokens, CAST(SUM(sc.s_milli) AS BIGINT) AS bits_milli,
        |  CAST(SUM(sc.s_milli) // COUNT(*) AS BIGINT) AS bpt_milli
        |FROM wf JOIN sc ON wf.w = sc.w
        |GROUP BY wf.doc_id ORDER BY wf.doc_id""".stripMargin,
    "q_tokenizer_fertility" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split(text, ' '), t -> length(t) > 0))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
        |  CAST((1000000 * SUM(len(list_filter(string_split(text, ' '), t -> length(t) > 0))))
        |    // SUM(strlen(text)) AS BIGINT) AS fert_micro
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_char_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, string_split(text, '') AS cs FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, len(cs) AS n_chars_split,
        |  len(list_distinct(cs)) AS n_distinct,
        |  CAST(list_sum(list_transform(list_distinct(cs),
        |    ch -> CAST(floor(-1000.0 * (CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE) / len(cs))
        |               * log2(CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE) / len(cs))) AS BIGINT))) AS BIGINT)
        |    AS entropy_milli
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_winnowing" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(ws) - 1),
        |      i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS hs
        |  FROM t WHERE len(ws) >= 6),
        |f AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(hs) - 2),
        |      j -> list_min(hs[j:j+3]))) AS fps
        |  FROM g),
        |e AS (SELECT doc_id, unnest(fps) AS fp FROM f)
        |SELECT fp, COUNT(DISTINCT doc_id) AS n_docs
        |FROM e GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, fp LIMIT 100""".stripMargin)
}
