package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.functions.Exprs.md5Long

/** Data-selection operators: which rows make the training set.
  *
  * The sampling family in [[TextStats]] (hash split, stratified,
  * reservoir, k-fold) answers "give me a deterministic fraction";
  * these three answer the curation questions that come right before:
  * trim the per-language length tails (CCNet-style fences), sample
  * proportionally to a quality/length weight, and equalize class
  * counts for a balanced eval set.
  *
  * All three share the repo's determinism contract: selection is a
  * pure function of the row key through [[md5Long]], so any executor
  * count, partitioning, or retry produces the same set — the property
  * that makes a 100 TB selection reproducible and resumable.
  */
object Selection {

  type Q = (SparkSession, String) => DataFrame

  /** q_length_fence — per-language length fences: the p05/p95 discrete
    * percentiles of `n_chars` within each language, and how much of
    * the corpus a keep-inside-the-fence rule would drop. Length
    * outliers are language-relative (a 200-char Chinese doc is long, a
    * 200-char German doc is a stub), which is why the fence must be
    * computed per group, not globally.
    *
    * Plan: one hash aggregate per language computes both percentiles
    * and all counts in a single pass — `percentile_disc` is an exact
    * aggregate, and the kept/total counters ride the same grouping, so
    * the corpus is scanned ONCE with no join back. At 100 TB the only
    * exchange is the |langs|-group aggregation. The WITHIN GROUP form
    * evaluates against the same rows the counters see; kept-counting
    * against the group's own percentile needs a second pass over the
    * group's rows, which `count_if` over a rejoin would do with a
    * second shuffle — instead the fence counters are folded into a
    * self-join on the tiny aggregate (|langs| rows broadcast). */
  val qLengthFence: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val fences = docs.groupBy("lang")
      .agg(
        expr("CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)")
          .as("lo_chars"),
        expr("CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)")
          .as("hi_chars"),
        count(lit(1)).as("n_docs"))
    docs.join(broadcast(fences), Seq("lang"))
      .groupBy(col("lang"), col("lo_chars"), col("hi_chars"), col("n_docs"))
      .agg(sum(when(col("n_chars").between(col("lo_chars"), col("hi_chars")), 1L)
        .otherwise(0L)).cast(LongType).as("n_kept"))
      .withColumn("drop_permille",
        expr("((n_docs - n_kept) * 1000) div n_docs").cast(LongType))
      .select("lang", "lo_chars", "hi_chars", "n_docs", "n_kept", "drop_permille")
      .orderBy("lang")
  }

  /** q_weighted_sample — weight-proportional Bernoulli sampling: each
    * document is kept with probability `n_chars / 2000` (longer docs
    * carry more tokens, so length-proportional inclusion approximates
    * token-uniform sampling — the mixing rule of Pile-style corpus
    * assembly). The coin is `md5Long('wsamp|' || doc_id) mod 1000`
    * compared against the integer permille weight: fully deterministic,
    * embarrassingly parallel, zero shuffles until the result sort, and
    * — unlike rand()-based sampling — identical across retries and
    * cluster sizes. LEAST caps the permille at 1000 so over-long docs
    * are simply always kept.
    *
    * Plan: a scan-side filter projection; nothing shuffles except the
    * result-sized ORDER BY. */
  val qWeightedSample: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .withColumn("p_permille",
        least(expr("n_chars div 2"), lit(1000L)).cast(LongType))
      .filter(pmod(md5Long(concat(lit("wsamp|"), col("doc_id").cast("string"))),
        lit(1000L)) < col("p_permille"))
      .select("doc_id", "lang", "n_chars", "p_permille")
      .orderBy("doc_id")

  /** q_class_balance — equalized downsampling: cap every label at the
    * size of the SMALLEST class, choosing survivors by deterministic
    * hash order (so the subsample is unbiased w.r.t. insertion order
    * and reproducible). The balanced-eval-set builder of a labeled
    * embedding corpus.
    *
    * Plan: per-label counts are a |labels|-row aggregate whose MIN
    * broadcasts back as a one-row scalar; survivor choice is a
    * row_number window on the label key — the one genuine shuffle.
    * A label with half the corpus still bounds the window partition,
    * which is the accepted cost of exact per-class ranking (a skewed
    * variant would pre-prune with a per-partition local top-k). */
  val qClassBalance: Q = (s, d) => {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val minCnt = emb.groupBy("label").agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("min_cnt"))
    val w = Window.partitionBy("label")
      .orderBy(md5Long(concat(lit("bal|"), col("vec_id").cast("string"))), col("vec_id"))
    emb.withColumn("rn", row_number().over(w).cast(LongType))
      .crossJoin(broadcast(minCnt))
      .filter(col("rn") <= col("min_cnt"))
      .select(col("vec_id"), col("label").cast(LongType).as("label"), col("rn"))
      .orderBy("label", "rn")
  }

  /** q_split_leakage — train/test contamination audit: split docs by a
    * doc_id-keyed hash (90/5/5 — id-keyed on purpose: [[TextStats
    * .qHashSplit]] hashes TEXT, under which duplicate contents always
    * co-locate and leakage is impossible by construction; auditing
    * leakage requires the id-keyed rule a real pipeline with unique
    * ids uses), then fingerprint every doc and report each duplicated
    * fingerprint with its per-split counts and a leaked flag (content
    * present in train AND in val/test). This is decontamination's
    * inward-facing twin: [[TextStats]] checks the corpus against an
    * external benchmark, this checks the corpus against its own split.
    * The small fixtures carry no exact duplicates (only sf0.1 does),
    * so the query plants them deterministically — every doc_id ≡ 0
    * (mod 17) gains a re-crawled clone at doc_id + 1,000,000 — the
    * same planted-evidence pattern as the PII scrub (the corpus lacks
    * the phenomenon; the operator must still prove it detects it).
    *
    * Plan: one scan → (fp, split) → a fp-keyed hash aggregate with
    * conditional counters (the pivot folded into SUM(CASE) so there is
    * exactly one shuffle on the high-cardinality fingerprint; the
    * clone union is a second pass over the same scan, filter-pruned). */
  val qSplitLeakage: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val clones = base.filter(pmod(col("doc_id"), lit(17)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    base.unionAll(clones)
      .select(md5(col("text")).as("fp"),
        pmod(md5Long(concat(lit("split|"), col("doc_id").cast("string"))),
          lit(100L)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 90, "train").when(col("bucket") < 95, "val")
          .otherwise("test"))
      .groupBy("fp")
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).cast(LongType).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).cast(LongType).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).cast(LongType).as("n_test"))
      .filter(col("n_train") + col("n_val") + col("n_test") > 1)
      .withColumn("leaked",
        when(col("n_train") > 0 && (col("n_val") > 0 || col("n_test") > 0), 1L)
          .otherwise(0L).cast(LongType))
      .orderBy("fp")
  }

  /** q_score_normalize — within-source percentile normalization: each
    * document's length mapped to its rank permille INSIDE its source
    * ((rn−1)·1000 div (n−1), the min-max rank transform). Sources have
    * wildly different length distributions; a single global threshold
    * over-prunes one source and under-prunes another — normalizing to
    * within-source percentiles is the standard equalizer before
    * cross-source quality cuts. Tie-break by doc_id keeps the rank
    * total and deterministic.
    *
    * Plan: ONE source-keyed exchange feeds both the row_number and the
    * per-source count (window aggregate over the same partitioning —
    * no second shuffle, no join back). */
  val qScoreNormalize: Q = (s, d) => {
    val wRank = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    val wAll = Window.partitionBy("source")
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .withColumn("n", count(lit(1)).over(wAll).cast(LongType))
      .withColumn("permille",
        when(col("n") === 1, 0L)
          .otherwise(expr("((rn - 1) * 1000) div (n - 1)")).cast(LongType))
      .select("doc_id", "source", "n_chars", "rn", "permille")
      .orderBy("doc_id")
  }

  /** q_dsir_weights — Data Selection via Importance Resampling (Xie et
    * al. 2023): score every raw document by how target-like its hashed
    * n-gram features are, log p̂_target(doc) − log p̂_raw(doc) under two
    * bag-of-features models. The target slice here is the English
    * sub-corpus (DSIR's "formal text" stand-in); features are word
    * bigrams hashed into B = 64 buckets — the hashing is the paper's
    * scale trick and this operator's scale story: the feature model is
    * EXACTLY B rows no matter the corpus size, so both model joins are
    * safe forced broadcasts at 100 TB (unlike the type-count-sized
    * unigram-LM model, which must stay unhinted — the X76 rule does
    * not apply because B is fixed by construction, not data-sized).
    *
    * Determinism: bucket counts are exact integers; each bucket's
    * log-ratio term floors to milli-bits once (add-one smoothing over
    * the B-bucket space, one double log2 per BUCKET, not per doc), and
    * per-document sums of those integer terms are aggregation-order
    * independent. `sel` marks docs whose importance ratio ≥ 1 — the
    * resampling keep-set at threshold 1.
    *
    * Plan: explode words once, bigrams from zipped slices (the
    * [[graft.operators.CorpusOps]] lead-chain contract), ONE 64-group
    * aggregate builds both distributions via conditional counters, the
    * 64-row scored model broadcasts back onto the feature stream, one
    * doc-keyed aggregate. Nothing corpus-sized shuffles except that
    * final per-doc agg. */
  val qDsirWeights: Q = (s, d) => {
    val docs = Tables.spread(Tables.documents(s, d)).filter(col("text").isNotNull)
    val ws = split(col("text"), " ")
    val feats = docs
      .filter(size(ws) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(arrays_zip(
          slice(ws, lit(1), size(ws) - 1).as("a"),
          slice(ws, lit(2), size(ws) - 1).as("b"))).as("p"))
      .filter(length(col("p.a")) > 0 && length(col("p.b")) > 0)
      .select(col("doc_id"), col("lang"),
        pmod(md5Long(concat(lit("dsir|"), col("p.a"), lit(" "), col("p.b"))),
          lit(64L)).as("f"))
      // pre-aggregate to the per-doc 64-feature histogram and
      // checkpoint it: the corpus bigram explode used to run TWICE
      // (model pass + scoring pass), and per-bigram rows crossed the
      // doc-keyed shuffle where ≤64 (doc, f, cnt) rows now do (r16,
      // guide §2.3/§2.4)
      .groupBy("doc_id", "lang", "f").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val model = feats.groupBy("f").agg(
      sum(when(col("lang") === "en", col("cnt")).otherwise(0L))
        .cast(LongType).as("c_t"),
      sum(col("cnt")).cast(LongType).as("c_r"))
    val totals = model.agg(sum("c_t").as("t_tot"), sum("c_r").as("r_tot"))
    val scored = model.crossJoin(broadcast(totals))
      .select(col("f"),
        floor(lit(1000) * log2(
          ((col("c_t") + 1).cast(DoubleType) / (col("c_r") + 1).cast(DoubleType)) *
            ((col("r_tot") + 64).cast(DoubleType) / (col("t_tot") + 64).cast(DoubleType))))
          .cast(LongType).as("term_milli"))
    feats
      .join(broadcast(scored), Seq("f"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).cast(LongType).as("n_feats"),
        sum(col("cnt") * col("term_milli")).as("dsir_milli"))
      .withColumn("sel",
        when(col("dsir_milli") >= 0, 1L).otherwise(0L).cast(LongType))
      .orderBy("doc_id")
  }

  /** q_inbatch_collisions — the false-negative audit of in-batch
    * negative sampling (the contrastive-training default: every other
    * item in the batch is treated as a negative): per deterministic
    * hash batch, how many within-batch PAIRS share a label — each one
    * a "negative" that is actually a positive, silently pushing
    * same-class items apart. Emitted per batch: size, colliding
    * pairs, total pairs, and the collision permille; a rate far above
    * the class-imbalance baseline means batches need label-aware
    * construction.
    *
    * Plan: batch id is a content hash ([[md5Long]] — stable under
    * re-runs/partitioning like every selection op here), one
    * (batch, label) count aggregate, one |batches|-group rollup of
    * nl·(nl−1)/2 — nothing wider than (batch, label) shuffles, and
    * the pair counts come from counts, never pair enumeration. */
  val qInbatchCollisions: Q = (s, d) => {
    val nB = 16
    Tables.embeddings(s, d).filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label").cast(LongType).as("label"))
      .withColumn("batch",
        pmod(md5Long(concat(lit("batch|"), col("vec_id").cast("string"))),
          lit(nB)).cast(LongType))
      .groupBy("batch", "label").agg(count(lit(1)).as("nl"))
      .groupBy("batch")
      .agg(sum("nl").cast(LongType).as("batch_size"),
        sum(expr("nl * (nl - 1) div 2")).cast(LongType).as("n_collisions"))
      .withColumn("n_pairs",
        expr("batch_size * (batch_size - 1) div 2").cast(LongType))
      .withColumn("collision_permille",
        when(col("n_pairs") > 0,
          expr("(n_collisions * 1000) div n_pairs")).otherwise(0L)
          .cast(LongType))
      .orderBy("batch")
  }

  /** q_epoch_shuffle — the training-order audit: a deterministic
    * per-epoch global shuffle (order by [[md5Long]]('ep|' ‖ epoch ‖
    * '|' ‖ doc_id)) for epochs 0–2, reported as the Spearman FOOTRULE
    * distance Σ|r₁−r₂| between every epoch pair. Multi-epoch training
    * wants each epoch to be a genuinely different permutation of the
    * corpus (repeating one order correlates gradient noise across
    * epochs), yet reproducible under any executor count or retry —
    * properties a seeded sort by content hash gives for free and an
    * `ORDER BY rand()` gives never. For independent uniform
    * permutations E[footrule] = n²/3, so the normalized column should
    * read ≈ 667‰ of its n²/2 maximum; values near 0 mean the "new"
    * epoch is the old order in disguise.
    *
    * Plan: ONE range exchange ranks all three epochs at once —
    * [[Ranking.globalRowNumber]] over (epoch, h, doc_id) gives a
    * global rn whose per-epoch rank is rn − epoch·n (epochs are
    * contiguous equal-sized blocks), with n supplied by a broadcast
    * scalar frame, not a driver action. The pair distances are one
    * doc-keyed self-join (3 rows/doc) and a 3-group rollup; footrule
    * sums ride DECIMAL(38,0) internally and leave as BIGINT — Σ|Δr| ≤
    * n² fits int64 up to ~3B docs (the no-DECIMAL-output contract,
    * SURVEY §"output typing": decimal128 final columns hash-fragile
    * on the driver's arrow stack, r10+r11). */
  val qEpochShuffle: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n1 = docs.agg(count(lit(1)).as("n"))
    val hashed = docs
      .select(col("doc_id"), explode(sequence(lit(0L), lit(2L))).as("e"))
      .withColumn("h", md5Long(concat(lit("ep|"), col("e").cast("string"),
        lit("|"), col("doc_id").cast("string"))))
    val ranked = Ranking.globalRowNumber(hashed,
        Seq(col("e"), col("h"), col("doc_id")), "rn")
      .crossJoin(broadcast(n1))
      .select(col("doc_id"), col("e"), (col("rn") - col("e") * col("n")).as("r"))
    ranked.as("a")
      .join(ranked.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.e") < col("b.e"))
      .groupBy(col("a.e").as("epoch_a"), col("b.e").as("epoch_b"))
      .agg(count(lit(1)).as("n_docs"),
        sum(abs(col("a.r") - col("b.r")).cast(DecimalType(38, 0)))
          .cast(DecimalType(38, 0)).as("fr_dec"))
      // permille of the n²/2 maximum as footrule·2000 div n² (single
      // decimal division — an inner n² div 2 would return a LONG and
      // wrap past ~4B docs; the odd-n floor(n²/2) nuance is < 1‰)
      .withColumn("footrule_permille",
        when(col("n_docs") > 1,
          expr("(fr_dec * 2000) div (cast(n_docs as decimal(38,0)) * n_docs)"))
          .cast(LongType))
      .select(col("epoch_a"), col("epoch_b"), col("n_docs"),
        col("fr_dec").cast(LongType).as("footrule"), col("footrule_permille"))
      .orderBy("epoch_a", "epoch_b")
  }

  /** q_hyperband_plan — per-source successive-halving schedule (the
    * inner loop of Hyperband, Li et al. 2018, η = 3): rung r keeps the
    * top ⌊n/3ʳ⌋ documents by score and grants survivors 3ʳ budget
    * units, so every rung costs ~the same total compute while the
    * pool sharpens 3× — the data-curriculum shape of "train briefly
    * on everything, longest on the best" ported from hyperparameter
    * search to data selection. Emits per (source, rung): survivors,
    * the score cutoff (the weakest survivor — the number a curator
    * quotes as "rung-r admission"), and the rung's unit budget.
    * Score = n_chars with doc_id tiebreak (the [[qScoreNormalize]]
    * convention); rungs with zero survivors emit nothing.
    *
    * Plan: ONE per-source rank window (shared exchange with the
    * per-source count), a ≤4-way rung explode of the ALREADY-ranked
    * rows pre-filtered to rn ≤ n (so the explode never exceeds
    * ~1.5 rows/doc: Σ 3⁻ʳ < 1.5), and a (source, rung)-bounded
    * rollup. The qPrCurve per-source-window caveat and remedy apply. */
  val qHyperbandPlan: Q = (s, d) => {
    val wRank = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val wSrc = Window.partitionBy("source")
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .withColumn("n", count(lit(1)).over(wSrc).cast(LongType))
      .select(col("source"), col("n_chars"), col("rn"),
        // the rn <= keep bound runs INSIDE the array filter (ADVICE
        // r14: a post-explode filter materializes up to 4 rows/doc
        // first; this way the explode itself never exceeds ~1.5
        // rows/doc on average — Σ 3⁻ʳ < 1.5)
        explode(expr("filter(transform(sequence(0, 3)," +
          " r -> named_struct('rung', CAST(r AS BIGINT)," +
          " 'keep', n div CAST(power(3, r) AS BIGINT)))," +
          " x -> x.keep >= 1 AND rn <= x.keep)")).as("x"))
      .groupBy(col("source"), col("x.rung").as("rung"))
      .agg(count(lit(1)).cast(LongType).as("n_kept"),
        min(col("n_chars")).cast(LongType).as("cutoff_score"))
      .withColumn("unit_budget",
        expr("n_kept * CAST(power(3, rung) AS BIGINT)"))
      .orderBy("source", "rung")
  }

  /** q_weighted_topk_sample — EXACT-k weighted sampling without
    * replacement per source (Efraimidis & Spirakis 2006, algorithm
    * A-ES): rank by the Gumbel-trick key log₂(w) − log₂(−log₂(u))
    * with u a deterministic md5-uniform in (0,1), take the top 5.
    * [[qWeightedSample]]'s Bernoulli coin gives a VARIABLE-size
    * sample; mixture assembly usually needs exactly k per stratum —
    * this is the standard distributed answer (one key per row, one
    * top-k, provably ∝-weight without replacement). Using −log₂(u)
    * instead of −ln(u) scales every exponential by the same 1/ln 2,
    * which cancels in the ranking, and keeps the whole key on the
    * repo's pinned-log2 determinism contract. Keys floor to micros
    * with doc_id tiebreak, mirrored in the oracle.
    *
    * Plan: scan-side key projection (codegen'd md5 + two log₂), one
    * per-source top-k window — the [[qClassBalance]] shape. */
  val qWeightedTopkSample: Q = (s, d) => {
    // (h + 0.5)/2^60 ∈ (0, 1); the upper clamp guards the measure-zero
    // case where the 60-bit h double-rounds up to 2^60 exactly
    val u = least(
      (md5Long(concat(lit("ates|"), col("doc_id").cast("string")))
        .cast(DoubleType) + lit(0.5)) / lit(1152921504606846976.0), // 2^60
      lit(0.9999999999999999))
    val keyMicro = floor(lit(1000000.0) *
      (log2(col("n_chars").cast(DoubleType)) - log2(-log2(u))))
      .cast(LongType)
    val w = Window.partitionBy("source")
      .orderBy(col("key_micro").desc, col("doc_id"))
    Tables.documents(s, d)
      .filter(col("text").isNotNull && col("n_chars") >= 1)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("key_micro", keyMicro)
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 5)
      .select("source", "rk", "doc_id", "n_chars", "key_micro")
      .orderBy("source", "rk")
  }

  val queries: Map[String, Q] = Map(
    "q_hyperband_plan" -> qHyperbandPlan,
    "q_weighted_topk_sample" -> qWeightedTopkSample,
    "q_epoch_shuffle" -> qEpochShuffle,
    "q_inbatch_collisions" -> qInbatchCollisions,
    "q_length_fence" -> qLengthFence,
    "q_weighted_sample" -> qWeightedSample,
    "q_class_balance" -> qClassBalance,
    "q_split_leakage" -> qSplitLeakage,
    "q_score_normalize" -> qScoreNormalize,
    "q_dsir_weights" -> qDsirWeights)

  val oracle: Map[String, String] = Map(
    "q_hyperband_plan" ->
      """WITH base AS (
        |  SELECT source, doc_id, n_chars FROM documents
        |  WHERE text IS NOT NULL),
        |ranked AS (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM base),
        |melt AS (
        |  SELECT source, n_chars, rn, n,
        |    unnest(generate_series(0, 3)) AS rung
        |  FROM ranked),
        |kept AS (
        |  SELECT source, rung, n_chars
        |  FROM melt
        |  WHERE n // CAST(power(3, rung) AS BIGINT) >= 1
        |    AND rn <= n // CAST(power(3, rung) AS BIGINT))
        |SELECT source, CAST(rung AS BIGINT) AS rung,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(MIN(n_chars) AS BIGINT) AS cutoff_score,
        |  CAST(COUNT(*) * CAST(power(3, rung) AS BIGINT) AS BIGINT)
        |    AS unit_budget
        |FROM kept GROUP BY source, rung ORDER BY source, rung""".stripMargin,
    "q_weighted_topk_sample" ->
      """WITH base AS (
        |  SELECT source, doc_id, n_chars,
        |    LEAST((CAST(CAST('0x' || substr(md5('ates|' ||
        |        CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
        |        + 0.5) / 1152921504606846976.0,
        |      0.9999999999999999) AS u
        |  FROM documents WHERE text IS NOT NULL AND n_chars >= 1),
        |keyed AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(floor(1000000.0 * (log2(CAST(n_chars AS DOUBLE))
        |      - log2(-log2(u)))) AS BIGINT) AS key_micro
        |  FROM base),
        |ranked AS (
        |  SELECT source, doc_id, n_chars, key_micro,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY key_micro DESC, doc_id) AS BIGINT) AS rk
        |  FROM keyed)
        |SELECT source, rk, doc_id, n_chars, key_micro
        |FROM ranked WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
    "q_epoch_shuffle" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nn AS (SELECT COUNT(*) AS n FROM docs),
        |h AS (
        |  SELECT e, doc_id,
        |    CAST('0x' || substr(md5('ep|' || CAST(e AS VARCHAR) || '|' ||
        |      CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM docs CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS e)),
        |r AS (
        |  SELECT e, doc_id,
        |    row_number() OVER (ORDER BY e, h, doc_id)
        |      - e * (SELECT n FROM nn) AS r
        |  FROM h)
        |SELECT CAST(a.e AS BIGINT) AS epoch_a, CAST(b.e AS BIGINT) AS epoch_b,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(CAST(abs(a.r - b.r) AS HUGEINT)) AS BIGINT)
        |    AS footrule,
        |  CASE WHEN COUNT(*) > 1 THEN
        |    CAST((SUM(CAST(abs(a.r - b.r) AS HUGEINT)) * 2000)
        |      // (CAST(COUNT(*) AS HUGEINT) * COUNT(*)) AS BIGINT)
        |  END AS footrule_permille
        |FROM r a JOIN r b ON a.doc_id = b.doc_id AND a.e < b.e
        |GROUP BY 1, 2 ORDER BY epoch_a, epoch_b""".stripMargin,
    "q_inbatch_collisions" ->
      """WITH e AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    CAST('0x' || substr(md5('batch|' || CAST(vec_id AS VARCHAR)),
        |      1, 15) AS BIGINT) % 16 AS batch
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |bl AS (
        |  SELECT batch, label, COUNT(*) AS nl FROM e GROUP BY 1, 2),
        |agg AS (
        |  SELECT batch, CAST(SUM(nl) AS BIGINT) AS batch_size,
        |    CAST(SUM(nl * (nl - 1) // 2) AS BIGINT) AS n_collisions
        |  FROM bl GROUP BY batch)
        |SELECT batch, batch_size, n_collisions,
        |  CAST(batch_size * (batch_size - 1) // 2 AS BIGINT) AS n_pairs,
        |  CAST(CASE WHEN batch_size > 1
        |    THEN (n_collisions * 1000) // (batch_size * (batch_size - 1) // 2)
        |    ELSE 0 END AS BIGINT) AS collision_permille
        |FROM agg ORDER BY batch""".stripMargin,
    "q_length_fence" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, n_chars FROM documents WHERE text IS NOT NULL),
        |fences AS (
        |  SELECT lang,
        |    CAST(quantile_disc(n_chars, 0.05) AS BIGINT) AS lo_chars,
        |    CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS hi_chars,
        |    COUNT(*) AS n_docs
        |  FROM docs GROUP BY lang)
        |SELECT d.lang, f.lo_chars, f.hi_chars, f.n_docs,
        |  CAST(SUM(CASE WHEN d.n_chars BETWEEN f.lo_chars AND f.hi_chars
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(((f.n_docs - SUM(CASE WHEN d.n_chars BETWEEN f.lo_chars AND f.hi_chars
        |           THEN 1 ELSE 0 END)) * 1000) // f.n_docs AS BIGINT) AS drop_permille
        |FROM docs d JOIN fences f USING (lang)
        |GROUP BY d.lang, f.lo_chars, f.hi_chars, f.n_docs
        |ORDER BY d.lang""".stripMargin,
    "q_weighted_sample" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(LEAST(n_chars // 2, 1000) AS BIGINT) AS p_permille
        |FROM documents
        |WHERE text IS NOT NULL
        |  AND CAST('0x' || substr(md5('wsamp|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |        % 1000
        |      < LEAST(n_chars // 2, 1000)
        |ORDER BY doc_id""".stripMargin,
    "q_split_leakage" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE text IS NOT NULL AND doc_id % 17 = 0),
        |tagged AS (
        |  SELECT md5(text) AS fp,
        |    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
        |  FROM (
        |    SELECT text,
        |      CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |        % 100 AS b
        |    FROM corpus)),
        |counts AS (
        |  SELECT fp,
        |    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |    CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
        |    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |  FROM tagged GROUP BY fp)
        |SELECT fp, n_train, n_val, n_test,
        |  CAST(CASE WHEN n_train > 0 AND (n_val > 0 OR n_test > 0) THEN 1 ELSE 0 END
        |    AS BIGINT) AS leaked
        |FROM counts WHERE n_train + n_val + n_test > 1
        |ORDER BY fp""".stripMargin,
    "q_score_normalize" ->
      """WITH ranked AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
        |      AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, source, n_chars, rn,
        |  CAST(CASE WHEN n = 1 THEN 0 ELSE ((rn - 1) * 1000) // (n - 1) END AS BIGINT)
        |    AS permille
        |FROM ranked ORDER BY doc_id""".stripMargin,
    "q_class_balance" ->
      """WITH m AS (
        |  SELECT MIN(n) AS min_cnt FROM (
        |    SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label)),
        |r AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    CAST(row_number() OVER (PARTITION BY label
        |      ORDER BY CAST('0x' || substr(md5('bal|' || CAST(vec_id AS VARCHAR)), 1, 15)
        |                  AS BIGINT), vec_id) AS BIGINT) AS rn
        |  FROM embeddings)
        |SELECT vec_id, label, rn FROM r, m WHERE rn <= min_cnt
        |ORDER BY label, rn""".stripMargin,
    "q_dsir_weights" ->
      """WITH wl AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |  WHERE text IS NOT NULL),
        |feats AS (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substr(md5('dsir|' || w[i] || ' ' || w[i+1]), 1, 15) AS BIGINT)
        |      % 64 AS f
        |  FROM wl, LATERAL (SELECT unnest(range(1, len(w))) AS i)
        |  WHERE len(w) >= 2 AND length(w[i]) > 0 AND length(w[i+1]) > 0),
        |model AS (
        |  SELECT f,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
        |    COUNT(*) AS c_r
        |  FROM feats GROUP BY f),
        |tot AS (SELECT SUM(c_t) AS t_tot, SUM(c_r) AS r_tot FROM model),
        |sc AS (
        |  SELECT f,
        |    CAST(floor(1000 * log2(
        |      (CAST(c_t + 1 AS DOUBLE) / CAST(c_r + 1 AS DOUBLE)) *
        |      (CAST(r_tot + 64 AS DOUBLE) / CAST(t_tot + 64 AS DOUBLE)))) AS BIGINT)
        |      AS term_milli
        |  FROM model CROSS JOIN tot)
        |SELECT feats.doc_id, COUNT(*) AS n_feats,
        |  CAST(SUM(sc.term_milli) AS BIGINT) AS dsir_milli,
        |  CAST(CASE WHEN SUM(sc.term_milli) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS sel
        |FROM feats JOIN sc USING (f)
        |GROUP BY feats.doc_id ORDER BY feats.doc_id""".stripMargin)
}
