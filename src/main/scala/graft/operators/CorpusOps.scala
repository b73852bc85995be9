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

  /** q_substring_spans — exact duplicated-substring spans (Lee et al.
    * 2021, "Deduplicating Training Data Makes Language Models Better":
    * remove every repeated substring above a length threshold, keeping
    * the corpus-first occurrence). The suffix-array of the paper is a
    * single-machine structure; the distributed equivalent indexes every
    * word 8-gram, keeps each gram's first occurrence in corpus order
    * (min (doc_id, pos)), marks all later occurrences duplicated, and
    * merges per-document duplicated positions into maximal spans with a
    * lag-window island pass — any repeated passage of ≥ 8 words is
    * covered, matching the paper's threshold semantics at word
    * granularity.
    *
    * Scale shape: gram hashing is scan-local array algebra; the only
    * corpus-sized exchanges are the gram hash-aggregate (map-side
    * partial) and the occurrence⋈first-occurrence hash join on the gram
    * key. The span merge windows partition by doc_id — maximal
    * cardinality, no skew. Nothing is ever all-pairs. */
  val qSubstringSpans: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    // structural when() guard: sequence(1, n) with n<1 runs DESCENDING
    // and Spark may evaluate collapsed projections on filter-dropped rows
    val grams = when(size(col("ws")) >= 8,
      transform(
        sequence(lit(1), size(col("ws")) - 7),
        i => struct(i.as("pos"),
          md5(concat_ws(" ", slice(col("ws"), i, lit(8)))).as("h"))))
      .otherwise(array().cast("array<struct<pos:int,h:string>>"))
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), size(col("ws")).cast(LongType).as("n_words"),
        grams.as("gs"))
    val occ = docs
      .filter(size(col("gs")) > 0)
      .select(col("doc_id"), explode(col("gs")).as("g"))
      .select(col("doc_id"), col("g.pos").cast(LongType).as("pos"), col("g.h").as("h"))
      .withColumn("k", col("doc_id") * 1000000L + col("pos"))
    // corpus-first occurrence per gram; a gram-keyed hash join marks
    // every later occurrence (including intra-document repeats)
    val first = occ.groupBy("h").agg(min("k").as("first_k"))
    val dup = occ.join(first, "h").filter(col("k") =!= col("first_k"))
      .select("doc_id", "pos")
    // island merge: each position covers [pos, pos+7]; positions are
    // distinct and ascending, so the running max of covered ends is
    // simply lag(pos)+7 — a new island starts when the gap exceeds it
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val spans = dup
      .withColumn("brk",
        when(lag(col("pos"), 1).over(w).isNull
          .or(col("pos") > lag(col("pos"), 1).over(w) + 7L), 1L).otherwise(0L))
      .withColumn("isl", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "isl")
      .agg(min("pos").as("s"), (max("pos") + 7L).as("e"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("e") - col("s") + 1L).as("dup_words"))
    docs.select("doc_id", "n_words")
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_words"), lit(0L)).as("dup_words"),
        col("n_words"),
        expr("case when n_words = 0 then 0L else (1000 * coalesce(dup_words, 0)) div n_words end")
          .as("dup_frac_milli"))
      .orderBy("doc_id")
  }

  /** q_url_canonical — URL canonicalization + canonical-URL dedup, the
    * first dedup any web corpus runs (before any content hashing).
    * The synthetic corpus carries no URLs, so each document derives one
    * deterministically — with parity-dependent casing, default :443
    * port, www prefix, utm_/ref tracking params, shuffled param order,
    * and a fragment — and the canonicalizer must collapse both variants
    * of the same logical URL: lowercase scheme+host, strip default port
    * and www, drop tracking params, sort survivors, drop the fragment.
    * Pure scan-side regex/array algebra; the only shuffle is the final
    * canonical-key aggregate. */
  val qUrlCanonical: Q = (s, d) => {
    // page/param ids derive from doc_id div 2, so each adjacent even/odd
    // doc pair names the SAME logical URL through the two different raw
    // spellings — the collapse is what proves the canonicalizer works
    val page = expr("(doc_id div 2) % 25").cast("string")
    val a = expr("(doc_id div 2) % 4").cast("string")
    val raw = when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit("HTTPS://WWW.Example.COM:443/Docs/"), page,
        lit("?z=1&utm_source=feed&a="), a, lit("#top")))
      .otherwise(concat(lit("https://www.example.com/Docs/"), page,
        lit("?a="), a, lit("&ref=rss&z=1")))
    val noFrag = regexp_replace(col("url"), "#.*$", "")
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1)),
        ":443$", ""),
      "^www\\.", "")
    val path = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val params = array_join(
      array_sort(filter(split(regexp_extract(noFrag, "\\?([^#]*)", 1), "&"),
        p => !(p.startsWith("utm_") || p.startsWith("ref=") || p === ""))),
      "&")
    Tables.documents(s, d)
      .select(col("doc_id"), raw.as("url"))
      .select(col("doc_id"),
        concat(lit("https://"), host, path, lit("?"), params).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
      .orderBy("canonical_url")
  }

  val queries: Map[String, Q] = Map(
    "q_pii_scrub" -> qPiiScrub,
    "q_unigram_ppl" -> qUnigramPpl,
    "q_tokenizer_fertility" -> qTokenizerFertility,
    "q_char_entropy" -> qCharEntropy,
    "q_winnowing" -> qWinnowing,
    "q_substring_spans" -> qSubstringSpans,
    "q_url_canonical" -> qUrlCanonical)

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
        |ORDER BY n_docs DESC, fp LIMIT 100""".stripMargin,
    "q_substring_spans" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |docs AS (SELECT doc_id, len(ws) AS n_words, ws FROM t),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 6),
        |    i -> struct_pack(pos := i, h := md5(array_to_string(ws[i:i+7], ' '))))) AS g
        |  FROM docs WHERE len(ws) >= 8),
        |occ AS (SELECT doc_id, CAST(g.pos AS BIGINT) AS pos, g.h AS h,
        |        doc_id * 1000000 + g.pos AS k FROM g),
        |fst AS (SELECT h, MIN(k) AS first_k FROM occ GROUP BY h),
        |dup AS (SELECT o.doc_id, o.pos FROM occ o JOIN fst f ON o.h = f.h
        |        WHERE o.k <> f.first_k),
        |m AS (SELECT doc_id, pos,
        |        lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM dup),
        |b AS (SELECT doc_id, pos,
        |        CASE WHEN prev IS NULL OR pos > prev + 7 THEN 1 ELSE 0 END AS brk FROM m),
        |isl AS (SELECT doc_id, pos,
        |        SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM b),
        |sp AS (SELECT doc_id, isl, MIN(pos) AS s, MAX(pos) + 7 AS e
        |       FROM isl GROUP BY doc_id, isl),
        |agg AS (SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s + 1) AS dup_words
        |        FROM sp GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(a.dup_words, 0) AS BIGINT) AS dup_words,
        |  CAST(d.n_words AS BIGINT) AS n_words,
        |  CAST(CASE WHEN d.n_words = 0 THEN 0
        |    ELSE (1000 * COALESCE(a.dup_words, 0)) // d.n_words END AS BIGINT) AS dup_frac_milli
        |FROM docs d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN 'HTTPS://WWW.Example.COM:443/Docs/' || ((doc_id // 2) % 25)
        |        || '?z=1&utm_source=feed&a=' || ((doc_id // 2) % 4) || '#top'
        |      ELSE 'https://www.example.com/Docs/' || ((doc_id // 2) % 25)
        |        || '?a=' || ((doc_id // 2) % 4) || '&ref=rss&z=1'
        |    END AS url
        |  FROM documents),
        |n AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM u),
        |p AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(
        |      lower(regexp_extract(nf, '^[A-Za-z]+://([^/?#]+)', 1)), ':443$', ''),
        |      '^www\.', '') AS host,
        |    regexp_extract(nf, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |    array_to_string(list_sort(list_filter(
        |      string_split(regexp_extract(nf, '\?([^#]*)', 1), '&'),
        |      q -> NOT (starts_with(q, 'utm_') OR starts_with(q, 'ref=') OR q = ''))), '&') AS params
        |  FROM n)
        |SELECT 'https://' || host || path || '?' || params AS canonical_url,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
        |FROM p GROUP BY canonical_url ORDER BY canonical_url""".stripMargin)
}
