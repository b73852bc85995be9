package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables
import graft.functions.Exprs.{dec2, intScaled}

/** Evaluation & statistics operators: the measurement layer a
  * training-data pipeline runs over its own classifiers, filters, and
  * splits — rank-based AUC, inter-annotator agreement, discriminative
  * term selection, probability calibration, association lift, and
  * trend regression. All exact-integer (micro/permille scaling, no
  * float accumulation), because an evaluation number that drifts with
  * aggregation order can't arbitrate between pipeline versions.
  *
  * Reference analog: the status-report layer (report.py:118-159)
  * reads back the crawler's own telemetry; these operators read back
  * the pipeline's own quality signals the same way.
  */
object Evaluation {

  type Q = (SparkSession, String) => DataFrame

  /** DECIMAL(38,0) → BIGINT that FAILS LOUDLY past ±(2⁶³−1) instead of
    * Spark's silent non-ANSI wrap. The pair-count columns this guards
    * (u2x here, n_conc/n_disc in [[qKendallTau]]) are n²-scale and
    * exceed int64 past ~2-4B docs/source; the DuckDB oracle's
    * CAST(HUGEINT AS BIGINT) already raises there, so without the
    * guard the two engines failed DIFFERENTLY — DuckDB with an error,
    * Spark with a wrapped value (ADVICE r12). raise_error makes the
    * failure symmetric: both engines now stop at the bound. */
  private def bigintExact(c: Column, what: String): Column =
    when(c.between(lit(Long.MinValue).cast(DecimalType(38, 0)),
        lit(Long.MaxValue).cast(DecimalType(38, 0))), c.cast(LongType))
      .otherwise(raise_error(
        concat(lit(s"$what overflows BIGINT: "), c.cast("string"))).cast(LongType))

  /** q_roc_auc — per-source ROC-AUC of a length-based relevance score
    * against the `lang = 'en'` binary label, via the Mann-Whitney
    * rank statistic: AUC = (Σ r̄⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻) with
    * midranks for ties. Midranks are kept integral by doubling
    * (2r̄ = 2·rank + tiecount − 1), so the whole statistic is exact
    * integer arithmetic until the final micro-scaled division —
    * AUC is THE threshold-free judge of a quality/filter score, and
    * a rank formulation is the only one that distributes (no O(n²)
    * pair enumeration).
    *
    * Plan: one scan; ranks come from a per-source window (partitioned
    * by a low-cardinality key — acceptable because each source's rows
    * fit an executor at any modeled scale; for a single giant source
    * the [[Ranking]] offset-prefix-sum decomposition applies verbatim);
    * the rank sums collapse in a |sources|-group aggregate. Sums ride
    * DECIMAL(38,0): Σ 2r̄ grows as n², past Long at ~2×10⁹ rows per
    * source. */
  val qRocAuc: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"), col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val wRank = Window.partitionBy("source").orderBy("score")
    val wTie = Window.partitionBy("source", "score")
    val ranked = docs
      .withColumn("r", rank().over(wRank))
      .withColumn("c", count(lit(1)).over(wTie))
      .withColumn("mr2",
        (lit(2L) * col("r") + col("c") - lit(1L)).cast(DecimalType(38, 0)))
    ranked.groupBy("source")
      .agg(sum(col("y")).cast(LongType).as("n_pos"),
        (count(lit(1)) - sum(col("y"))).cast(LongType).as("n_neg"),
        sum(when(col("y") === 1L, col("mr2"))
          .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("smr2"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .withColumn("auc_micro", expr(
        """((smr2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 1000000)
          | div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)""".stripMargin)
        .cast(LongType))
      .select("source", "n_pos", "n_neg", "auc_micro")
      .orderBy("source")
  }

  /** q_pr_curve — the operating-point companion to [[qRocAuc]]: the
    * precision/recall curve of the same length-based score against
    * the `lang = 'en'` label, evaluated at the ten rank-decile
    * cutoffs per source ("keep the top-k% by score" is how filter
    * thresholds actually ship). AUC says whether a score CAN rank;
    * the PR curve says what a concrete cutoff COSTS — and under class
    * imbalance (the norm for quality labels) PR is the curve that
    * moves, which is why both belong in the eval layer. Deterministic
    * cutoffs: row_number over (score desc, doc_id) — ties broken by
    * key, decile membership exact on both engines.
    *
    * Plan: one scan; the rank and the per-source row count share ONE
    * per-source window exchange (same caveat and same remedy as
    * [[qRocAuc]]); the curve itself is a cumulative window over ≤ 10
    * decile rows per source — bounded frames, nothing corpus-wide. */
  val qPrCurve: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"), col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val wRank = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id"))
    val wSrc = Window.partitionBy("source")
    val buckets = docs
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wSrc))
      .withColumn("decile", (expr("((rn - 1) * 10) div n") + 1).cast(LongType))
      .groupBy("source", "decile")
      .agg(count(lit(1)).as("n_b"), sum("y").as("pos_b"))
    val wCum = Window.partitionBy("source").orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets
      .withColumn("k", sum("n_b").over(wCum).cast(LongType))
      .withColumn("tp", sum("pos_b").over(wCum).cast(LongType))
      .withColumn("n_pos", sum("pos_b").over(wSrc).cast(LongType))
      .select(col("source"), col("decile"), col("k"), col("tp"),
        expr("(tp * 1000) div k").cast(LongType).as("precision_permille"),
        expr("(tp * 1000) div GREATEST(n_pos, 1)").cast(LongType)
          .as("recall_permille"))
      .orderBy("source", "decile")
  }

  /** The [[TextStats.qLangId]] marker counts, shared by both kappa
    * annotators (one scan, two decision cascades). */
  private def markerCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextStats.occurrences(col("text"), "the").as("c_the"),
        TextStats.occurrences(col("text"), "data").as("c_data"),
        TextStats.occurrences(col("text"), "scan").as("c_scan"),
        TextStats.occurrences(col("text"), "join").as("c_join"))

  /** q_kappa_agreement — Cohen's kappa between two lang-id heuristics
    * over the same marker counts but opposite tie-break cascades
    * (annotator A prefers the/data/scan/join, B prefers
    * join/scan/data/the). Kappa = (p₀ − pₑ)/(1 − pₑ) cross-multiplied
    * to integers: κ·10⁶ = 10⁶(n·Σdiag − Σ row·col) div (n² − Σ row·col).
    * Raw agreement overstates labeler quality whenever classes are
    * imbalanced; kappa is the chance-corrected number annotation ops
    * actually compare, and disagreement between two cheap heuristics
    * is exactly the routing signal for "send this slice to a better
    * model".
    *
    * Plan: one corpus scan → a ≤16-cell (A-class × B-class) aggregate;
    * everything downstream (marginals, diagonal, the kappa algebra)
    * runs over those cells — constant-sized at any corpus scale. */
  val qKappaAgreement: Q = (s, d) => {
    val m = markerCounts(s, d)
      .withColumn("ca",
        when(col("c_the") >= col("c_data") && col("c_the") >= col("c_scan")
          && col("c_the") >= col("c_join"), "en")
          .when(col("c_data") >= col("c_scan") && col("c_data") >= col("c_join"), "dat")
          .when(col("c_scan") >= col("c_join"), "scn")
          .otherwise("jon"))
      .withColumn("cb",
        when(col("c_join") >= col("c_scan") && col("c_join") >= col("c_data")
          && col("c_join") >= col("c_the"), "jon")
          .when(col("c_scan") >= col("c_data") && col("c_scan") >= col("c_the"), "scn")
          .when(col("c_data") >= col("c_the"), "dat")
          .otherwise("en"))
    val cells = m.groupBy("ca", "cb").agg(count(lit(1)).as("n"))
    val ra = cells.groupBy("ca").agg(sum(col("n")).as("na"))
    val cb = cells.groupBy("cb").agg(sum(col("n")).as("nb"))
    val pe = ra.join(cb, col("ca") === col("cb"))
      .agg(sum((col("na") * col("nb")).cast(DecimalType(38, 0))).as("pe_num"))
    val tot = cells.agg(
      sum(col("n")).cast(LongType).as("n_docs"),
      sum(when(col("ca") === col("cb"), col("n")).otherwise(0L))
        .cast(LongType).as("n_agree"))
    tot.crossJoin(pe)
      .withColumn("po_permille",
        expr("(n_agree * 1000) div n_docs").cast(LongType))
      .withColumn("kappa_micro", expr(
        """((CAST(n_docs AS DECIMAL(38,0)) * n_agree - pe_num) * 1000000)
          | div (CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe_num)""".stripMargin)
        .cast(LongType))
      .select("n_docs", "n_agree", "po_permille", "kappa_micro")
  }

  /** q_chi2_terms — χ²-based discriminative-term selection: for every
    * word with document frequency ≥ 5, the 2×2 independence test of
    * doc-level presence against the `lang = 'en'` class,
    * χ²·10⁶ = 10⁶·N(ad − bc)² div ((a+b)(c+d)(a+c)(b+d)); top 20 by
    * χ², each with the direction it skews. The classic feature-
    * selection statistic (and the data-selection dual: terms whose
    * presence predicts a slice are the terms a targeted filter keys
    * on). Interior arithmetic in DECIMAL(38,0): (ad−bc)² grows as N⁴,
    * exact to ~3×10⁹ docs — past that the test statistic needs the
    * float path (document, don't silently wrap).
    *
    * Plan: one scan → per-doc distinct words explode → a (word)-keyed
    * count pair (df, class hits) with map-side combine; corpus totals
    * ride a broadcast single-row frame; top-20 plans as TakeOrdered
    * under the deterministic (χ² desc, word) order. */
  val qChi2Terms: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"), col("text"))
    val totals = docs.agg(count(lit(1)).cast(LongType).as("n"),
      sum(col("y")).cast(LongType).as("n_pos"))
    val perTerm = docs
      .select(col("y"), explode(array_distinct(
        filter(split(col("text"), " "), w => length(w) > 0))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).cast(LongType).as("df"),
        sum(col("y")).cast(LongType).as("a"))
      .filter(col("df") >= 5)
    perTerm.crossJoin(broadcast(totals))
      .filter(col("df") < col("n") && col("n_pos") > 0 && col("n_pos") < col("n"))
      .withColumn("chi2_micro", expr(
        """(CAST(n AS DECIMAL(38,0))
          |  * (CAST(a AS DECIMAL(38,0)) * (n - n_pos - df + a)
          |     - CAST(df - a AS DECIMAL(38,0)) * (n_pos - a))
          |  * (CAST(a AS DECIMAL(38,0)) * (n - n_pos - df + a)
          |     - CAST(df - a AS DECIMAL(38,0)) * (n_pos - a))
          |  * 1000000)
          | div (CAST(df AS DECIMAL(38,0)) * (n - df) * n_pos * (n - n_pos))"""
          .stripMargin).cast(LongType))
      .withColumn("enriched_in", when(
        expr("""CAST(a AS DECIMAL(38,0)) * (n - n_pos - df + a)
               | > CAST(df - a AS DECIMAL(38,0)) * (n_pos - a)""".stripMargin),
        "en").otherwise("rest"))
      .select(col("w").as("word"), col("df"), col("a").as("df_en"),
        col("chi2_micro"), col("enriched_in"))
      .orderBy(col("chi2_micro").desc, col("word"))
      .limit(20)
  }

  /** q_calibration_bins — the reliability table of a permille-scaled
    * length score predicting `lang = 'en'`: scores bucket into 10
    * equal-width bins; per bin, the count, the mean predicted
    * permille, and the observed positive rate in permille. A model
    * whose bin means track its observed rates is calibrated; the gap
    * per bin is what temperature-scaling/Platt fitting consumes. The
    * operator is deliberately score-agnostic — swap the score column
    * and the same table audits any filter in the pipeline.
    *
    * Plan: scan-side bucket arithmetic into a 10-group aggregate —
    * map-side collapse, constant-width shuffle at any corpus size. */
  val qCalibrationBins: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(
        least(lit(1000L), expr("(n_chars * 1000) div 600")).as("pred_permille"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .withColumn("bin", least(lit(9L), expr("pred_permille div 100")).cast(LongType))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(pred_permille) div count(1)").cast(LongType)
          .as("mean_pred_permille"),
        expr("(sum(y) * 1000) div count(1)").cast(LongType)
          .as("obs_pos_permille"))
      .orderBy("bin")

  /** q_basket_lift — association rules over order baskets: for every
    * unordered brand pair co-occurring in ≥ 5 orders, the support,
    * confidence, and lift (P(ab)/(P(a)P(b)), micro-scaled integer:
    * lift·10⁶ = 10⁶·n_ab·N div (n_a·n_b)). Market-basket lift is the
    * canonical "what co-occurs beyond chance" operator — the same
    * shape mines co-occurring sources, tags, or near-dup clusters in
    * a corpus audit.
    *
    * Plan: baskets build from lineitem ⋈ broadcast(part); the pair
    * generator is a self-equi-join ON the basket key (co-partitioned
    * shuffle, candidate count bounded by Σ |basket|² with |basket| ≤
    * |brands| — never corpus × corpus); item frequencies broadcast
    * back onto the pair aggregate; top-20 plans as TakeOrdered. */
  val qBasketLift: Q = (s, d) => {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("item"))
      .distinct()
    val nOrders = items.agg(countDistinct(col("o")).as("n_orders"))
    val freq = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = items.as("x")
      .join(items.as("y"),
        col("x.o") === col("y.o") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 5)
    pairs
      .join(broadcast(freq).withColumnRenamed("item", "item_a")
        .withColumnRenamed("n_item", "n_a"), Seq("item_a"))
      .join(broadcast(freq).withColumnRenamed("item", "item_b")
        .withColumnRenamed("n_item", "n_b"), Seq("item_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("item_a"), col("item_b"), col("n_ab").cast(LongType).as("n_ab"),
        expr("(n_ab * 1000) div n_orders").cast(LongType).as("support_permille"),
        expr("(n_ab * 1000) div n_a").cast(LongType).as("conf_permille"),
        expr("""(CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000)
               | div (CAST(n_a AS DECIMAL(38,0)) * n_b)""".stripMargin)
          .cast(LongType).as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("item_a"), col("item_b"))
      .limit(20)
  }

  /** q_ols_trend — per-event-type exact least-squares trend of value
    * over time: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) with x = epoch
    * seconds re-centered at 2024-01-01 (a fixed literal, so both
    * engines subtract the same constant and the sums stay small) and
    * y = value cents; emitted as micro-cents per day plus the
    * intercept (the fitted value at the epoch origin). Σx² grows as
    * n·x² — far past Long — so every sum rides DECIMAL(38,0) and only
    * the final integral divisions narrow. Trend lines over telemetry
    * are the reference's status-report question ("is the crawl rate
    * decaying?", report.py:139-151) answered with a statistic instead
    * of eyeballs.
    *
    * Plan: one scan, five sums in a |event_type|-group aggregate —
    * map-side partials, constant-width shuffle. */
  val qOlsTrend: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        (expr("ts div 1000000000") - lit(1704067200L)).cast(dec).as("x"),
        intScaled(dec2(col("value")), 100L).cast(dec).as("y"))
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(expr("n * sxx - sx * sx != 0"))
      .select(col("event_type"), col("n_events"),
        expr("((n * sxy - sx * sy) * 86400 * 1000000) div (n * sxx - sx * sx)")
          .cast(LongType).as("slope_micro_cents_per_day"),
        expr("(sy * sxx - sx * sxy) div (n * sxx - sx * sx)")
          .cast(LongType).as("intercept_cents"))
      .orderBy("event_type")
  }

  /** q_mann_whitney — the Mann–Whitney U rank-sum test between every
    * source pair on document length: the nonparametric "is corpus A
    * longer than corpus B" comparison quality pipelines need when
    * length/score distributions are heavy-tailed and a mean test lies.
    * Reported per pair: 2·U₁ (doubled so tie half-credits stay
    * INTEGER) and the common-language effect size P(a > b) + ½P(tie)
    * in permille — which is exactly the ROC-AUC of "distinguish the
    * sources by length", the same statistic [[qRocAuc]] computes for
    * a labeled classifier.
    *
    * Exactness: midranks via the doubled form 2·mid(v) = 2·cum<(v) +
    * ties(v) + 1 — all integers; 2U₁ = Σ c₁(v)·2mid(v) − n₁(n₁+1)
    * rides DECIMAL(38,0) (rank·count products reach n² and wrap int64
    * past ~3B docs — the qRocAuc lesson).
    *
    * Plan: the corpus collapses to a per-(source, value) HISTOGRAM
    * map-side — everything after is value-domain-sized, not
    * corpus-sized. The pair table explodes each source's histogram
    * once per partner (sources² rows of |V| each), the midrank cumsum
    * windows partition per PAIR over distinct values only, and the
    * rollup is one row per pair. At 100 TB the histogram is the whole
    * trick: ranks need a total order, but only over the ~10⁴ distinct
    * lengths, never the 10¹² rows. */
  val qMannWhitney: Q = (s, d) => {
    val hist = Tables.documents(s, d)
      // NULL lengths out: Spark windows sort nulls FIRST, DuckDB LAST —
      // a null value would silently shift every rank between engines
      .filter(col("n_chars").isNotNull)
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds both sides of the pair explode
    val srcs = hist.select("source").distinct()
    // broadcast: bounded pair frame, same stats-blind-cartesian class
    // as qWasserstein1d's pairs (r12 rule)
    val pairs = srcs.select(col("source").as("sa"))
      .join(broadcast(srcs.select(col("source").as("sb"))),
        col("sa") < col("sb"))
    val m1 = pairs.join(hist.withColumnRenamed("source", "sa"), Seq("sa"))
      .select(col("sa"), col("sb"), col("v"), col("c").as("c1"), lit(0L).as("c2"))
    val m2 = pairs.join(hist.withColumnRenamed("source", "sb"), Seq("sb"))
      .select(col("sa"), col("sb"), col("v"), lit(0L).as("c1"), col("c").as("c2"))
    val merged = m1.unionAll(m2)
      .groupBy("sa", "sb", "v")
      .agg(sum("c1").as("c1"), sum("c2").as("c2"))
    val wCum = Window.partitionBy("sa", "sb").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = DecimalType(38, 0)
    merged
      .withColumn("cum", sum(expr("c1 + c2")).over(wCum) - expr("c1 + c2"))
      .groupBy("sa", "sb")
      .agg(sum("c1").cast(LongType).as("n1"),
        sum("c2").cast(LongType).as("n2"),
        sum(col("c1").cast(dec) * (expr("2 * cum + (c1 + c2) + 1")))
          .cast(dec).as("r1x2"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("n1"), col("n2"),
        // BIGINT out (no-DECIMAL-output contract): u2x = 2·U₁ ≤ 2·n1·n2
        // fits int64 below ~3B docs/source; decimal only INSIDE the
        // agg, and [[bigintExact]] raises at the bound like the
        // oracle's HUGEINT→BIGINT cast does
        bigintExact(col("r1x2") - col("n1").cast(dec) * (col("n1") + 1),
          "u2x").as("u2x"),
        expr("""((r1x2 - cast(n1 as decimal(38,0)) * (n1 + 1)) * 500)
               div (cast(n1 as decimal(38,0)) * n2)""")
          .cast(LongType).as("cles_permille"))
      .orderBy("source_a", "source_b")
  }

  /** q_simpson_reversal — Simpson's-paradox audit of the quality keep
    * rate between every source pair: does "source A keeps more than
    * source B" hold per language stratum but FLIP when the strata are
    * pooled (or vice versa)? Pooled comparisons drive real mixing
    * decisions, and a reversal means the pooled number is a
    * composition artifact (A is heavy in an easy language), not a
    * quality fact — the single most common way a corpus dashboard
    * lies. Emits per pair: strata counted (languages both sources
    * populate), the pooled verdict, how many strata agree/reverse/tie,
    * and the paradox flag (reversals outnumber agreements under a
    * decided pooled verdict).
    *
    * Exactness: rates are never divided — `k_a·n_b <?> k_b·n_a`
    * cross-multiplication decides every verdict in DECIMAL(38,0)
    * (count×count wraps int64 past ~3B docs); the keep rule is
    * [[TextStats.qQualityScore]]'s verbatim, so the audit measures
    * the SAME flag the pipeline filters on.
    *
    * Plan: one scan collapses to a (source, lang) histogram — the
    * pairing, verdicts, and rollup all run on |sources|·|langs| rows.
    * The 100 TB cost is the scan; the paradox math is free. */
  val qSimpsonReversal: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val h = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("source"), col("lang"),
        graft.operators.Packing.wsTokens(col("text")).as("n_tokens"),
        TextStats.nStop4(col("text")).as("n_stop"))
      .withColumn("keep",
        expr("(n_stop * 100) div n_tokens") >= 3 && col("n_tokens") >= 10)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("k"))
      .localCheckpoint() // both sides of the source pairing
    val a = h.select(col("source").as("sa"), col("lang"),
      col("n").as("na"), col("k").as("ka"))
    val b = h.select(col("source").as("sb"), col("lang"),
      col("n").as("nb"), col("k").as("kb"))
    val strat = a.join(b, Seq("lang")).filter(col("sa") < col("sb"))
      .withColumn("v",
        when(col("ka").cast(dec) * col("nb") > col("kb").cast(dec) * col("na"), 1L)
          .when(col("ka").cast(dec) * col("nb") < col("kb").cast(dec) * col("na"), -1L)
          .otherwise(0L))
    strat.groupBy("sa", "sb")
      .agg(count(lit(1)).as("n_strata"),
        sum("na").cast(dec).as("tna"), sum("ka").cast(dec).as("tka"),
        sum("nb").cast(dec).as("tnb"), sum("kb").cast(dec).as("tkb"),
        sum(when(col("v") === 1L, 1L).otherwise(0L)).as("a_wins"),
        sum(when(col("v") === -1L, 1L).otherwise(0L)).as("b_wins"),
        sum(when(col("v") === 0L, 1L).otherwise(0L)).cast(LongType)
          .as("n_ties"))
      .withColumn("pooled_verdict",
        when(col("tka") * col("tnb") > col("tkb") * col("tna"), 1L)
          .when(col("tka") * col("tnb") < col("tkb") * col("tna"), -1L)
          .otherwise(0L))
      .withColumn("n_agree",
        when(col("pooled_verdict") === 1L, col("a_wins"))
          .when(col("pooled_verdict") === -1L, col("b_wins"))
          .otherwise(lit(0L)).cast(LongType))
      .withColumn("n_reversed",
        when(col("pooled_verdict") === 1L, col("b_wins"))
          .when(col("pooled_verdict") === -1L, col("a_wins"))
          .otherwise(lit(0L)).cast(LongType))
      .withColumn("simpson_flag",
        col("pooled_verdict") =!= 0L && col("n_reversed") > col("n_agree"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("n_strata").cast(LongType).as("n_strata"),
        col("pooled_verdict"), col("n_agree"), col("n_reversed"),
        col("n_ties"), col("simpson_flag"))
      .orderBy("source_a", "source_b")
  }

  /** q_kendall_tau — rank-agreement audit between two per-document
    * quality signals (token count vs stopword-ratio bucket), per
    * source, as Kendall concordant/discordant pair counts. Two
    * signals that "measure quality" but rank documents in a different
    * order will silently disagree about what a threshold filter
    * keeps; tau is the threshold-free way to see it, and emitting the
    * raw (P, Q, tie) counts lets any tau variant (a, b, c) be formed
    * downstream without re-scanning the corpus.
    *
    * The distributed-exact trick (the 2-D analog of
    * [[qMannWhitney]]'s histogram): the y signal is BUCKETED to a
    * fixed 32-cell grid (stop-permille div 32 — tau is computed ON
    * that grid, stated contract), so concordance needs only 2-D
    * dominance counts over (x, bucket) cells, never row pairs:
    * P = Σ_cell c · #{items with smaller x AND smaller bucket}, where
    * the dominance count comes from a per-(source, bucket) running
    * sum over x (32 bounded windows) plus a per-(source, x) prefix
    * over the 32 buckets. Everything after the first scan is
    * value-domain-sized (|distinct x| · 32 rows per source).
    *
    * Exactness: pair counts ride DECIMAL(38,0) (P ≤ n²/2 wraps int64
    * past ~4B docs/source) and leave as BIGINT; the signed
    * tau-a permille uses the additive-shift floor division
    * ((x + B·n) div n − B) so Spark's truncate-toward-zero and
    * DuckDB's floor agree on negative values. */
  val qKendallTau: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val base = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"),
        graft.operators.Packing.wsTokens(col("text")).as("x"),
        TextStats.nStop4(col("text")).as("n_stop"))
      .filter(col("x") >= 1)
      // nStop ≤ token count by construction (each counted stopword
      // consumes a token), so permille ≤ 1000 and bucket ≤ 31; least()
      // pins the contract if the signal ever changes
      .withColumn("b", least(expr("(n_stop * 1000) div x div 32"), lit(31L)))
    val cells = base.groupBy("source", "x", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds grid, x-ties, and y-ties below
    val grid = cells.select("source", "x").distinct()
      .select(col("source"), col("x"),
        explode(sequence(lit(0L), lit(31L))).as("b"))
      .join(cells, Seq("source", "x", "b"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val wLess = Window.partitionBy("source", "b").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPref = Window.partitionBy("source", "x").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy("source", "x")
    val dom = grid
      .withColumn("lessb", coalesce(sum(col("c")).over(wLess), lit(0L)))
      .withColumn("prefb", coalesce(sum(col("lessb")).over(wPref), lit(0L)))
      .withColumn("totless", sum(col("lessb")).over(wTot))
    val pq = dom.groupBy("source")
      .agg(sum(col("c")).cast(LongType).as("n"),
        sum(col("c").cast(dec) * col("prefb")).cast(dec).as("p"),
        sum(col("c").cast(dec) * (col("totless") - col("lessb") - col("prefb")))
          .cast(dec).as("q"))
    val tiesX = cells.groupBy("source", "x").agg(sum("c").as("cx"))
      .groupBy("source")
      .agg(sum(expr("cast(cx as decimal(38,0)) * (cx - 1) div 2"))
        .cast(LongType).as("n_ties_x"))
    val tiesY = cells.groupBy("source", "b").agg(sum("c").as("cb"))
      .groupBy("source")
      .agg(sum(expr("cast(cb as decimal(38,0)) * (cb - 1) div 2"))
        .cast(LongType).as("n_ties_y"))
    pq.join(tiesX, Seq("source")).join(tiesY, Seq("source"))
      .filter(col("n") >= 2)
      .withColumn("n0", expr("cast(n as decimal(38,0)) * (n - 1) div 2"))
      .select(col("source"), col("n"),
        bigintExact(col("p"), "n_conc").as("n_conc"),
        bigintExact(col("q"), "n_disc").as("n_disc"),
        col("n_ties_x"), col("n_ties_y"),
        // additive-shift floor: |P−Q| ≤ n0 so the permille is in
        // [−1000, 1000]; +1001·n0 makes the dividend non-negative in
        // both engines, then the shift subtracts back out
        expr("((p - q) * 1000 + n0 * 1001) div n0 - 1001")
          .cast(LongType).as("tau_a_permille"))
      .orderBy("source")
  }

  /** q_wasserstein_1d — exact 1-D earth-mover's distance between every
    * source pair's document-length distributions. KS
    * ([[qMannWhitney]]'s sibling q_ks_distance) reports the WORST
    * single CDF gap; W₁ integrates ALL of it — the number that tracks
    * "how many characters of mass must move to make source B look
    * like source A", which is what a mixture rebalance actually costs.
    *
    * Exact integer form on the merged value grid: with per-source
    * counts nA/nB and inclusive cumulative counts cumA/cumB at each
    * distinct length v, W₁ = Σ_gaps |cumA·nB − cumB·nA| · (v′ − v) on
    * the common denominator nA·nB, emitted milli-scaled
    * (·1000 div (nA·nB)) — non-negative, so truncate-vs-floor never
    * diverges. The cross-products ride DECIMAL(38,0) (n²·range wraps
    * int64 early); the histogram trick keeps everything after the
    * first scan value-domain-sized, exactly as [[qMannWhitney]]. */
  val qWasserstein1d: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val hist = Tables.documents(s, d)
      .filter(col("n_chars").isNotNull)
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // both sides of the pair explode
    val srcs = hist.select("source").distinct()
    // broadcast: |sources| rows by construction, but the distinct's
    // size estimate inherits the corpus scan (stats don't shrink
    // through aggregates) — unhinted, this non-equi pair join is the
    // r12 stats-blind-cartesian class
    val pairs = srcs.select(col("source").as("sa"))
      .join(broadcast(srcs.select(col("source").as("sb"))),
        col("sa") < col("sb"))
    val m1 = pairs.join(hist.withColumnRenamed("source", "sa"), Seq("sa"))
      .select(col("sa"), col("sb"), col("v"), col("c").as("c1"), lit(0L).as("c2"))
    val m2 = pairs.join(hist.withColumnRenamed("source", "sb"), Seq("sb"))
      .select(col("sa"), col("sb"), col("v"), lit(0L).as("c1"), col("c").as("c2"))
    val merged = m1.unionAll(m2)
      .groupBy("sa", "sb", "v")
      .agg(sum("c1").as("c1"), sum("c2").as("c2"))
    val wCum = Window.partitionBy("sa", "sb").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy("sa", "sb").orderBy("v")
    val wPair = Window.partitionBy("sa", "sb")
    merged
      .withColumn("cuma", sum("c1").over(wCum))
      .withColumn("cumb", sum("c2").over(wCum))
      .withColumn("na", sum("c1").over(wPair))
      .withColumn("nb", sum("c2").over(wPair))
      .withColumn("nextv", lead(col("v"), 1).over(wLead))
      // last grid point carries no mass gap (CDFs are both 1 past it)
      .withColumn("term",
        when(col("nextv").isNotNull,
          abs(col("cuma").cast(dec) * col("nb")
            - col("cumb").cast(dec) * col("na"))
            * (col("nextv") - col("v")))
          .otherwise(lit(0L).cast(dec)))
      .groupBy("sa", "sb")
      .agg(max(col("na")).cast(LongType).as("n_a"),
        max(col("nb")).cast(LongType).as("n_b"),
        sum(col("term")).cast(dec).as("num"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("n_a"), col("n_b"),
        expr("(num * 1000) div (cast(n_a as decimal(38,0)) * n_b)")
          .cast(LongType).as("w1_milli"))
      .orderBy("source_a", "source_b")
  }

  /** q_mcnemar_filters — paired filter-change audit: for each source,
    * the 2×2 agreement table between the pipeline's stopword-ratio
    * keep rule ([[TextStats.qQualityScore]]'s, rule A) and a
    * mean-token-length sanity rule (rule B), with McNemar's statistic
    * on the discordant cells. Swapping quality filters mid-pipeline
    * is only safe when the keep DECISIONS mostly agree — aggregate
    * keep RATES can match while the filters keep disjoint documents,
    * and McNemar is the paired test that sees it (only b and c, the
    * disagreements, carry signal).
    *
    * Exact: χ² = (b−c)²/(b+c) emitted permille via non-negative
    * integer division ((b−c)² is a square — no sign hazard); the
    * square rides DECIMAL(38,0) past ~3B docs/source. One scan, one
    * |sources|-group rollup — nothing here costs anything at scale. */
  val qMcnemarFilters: Q = (s, d) => {
    // n_chars (the precomputed column), NOT length(text): Spark length
    // counts UTF-16 units, DuckDB counts codepoints — they diverge on
    // non-BMP text, while the stored column is engine-neutral
    val base = Tables.documents(s, d)
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(col("source"),
        graft.operators.Packing.wsTokens(col("text")).as("nt"),
        TextStats.nStop4(col("text")).as("ns"),
        col("n_chars").cast(LongType).as("len"))
      .filter(col("nt") >= 1)
      .withColumn("ka",
        expr("(ns * 100) div nt") >= 3 && col("nt") >= 10)
      .withColumn("kb",
        col("nt") >= 10 && expr("len div nt").between(3L, 12L))
    base.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("ka") && col("kb"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("ka") && !col("kb"), 1L).otherwise(0L)).as("n_a_only"),
        sum(when(!col("ka") && col("kb"), 1L).otherwise(0L)).as("n_b_only"),
        sum(when(!col("ka") && !col("kb"), 1L).otherwise(0L)).as("n_neither"))
      .withColumn("agree_permille",
        expr("((n_both + n_neither) * 1000) div n"))
      .withColumn("mcnemar_permille",
        when(col("n_a_only") + col("n_b_only") > 0,
          expr("""(cast(n_a_only - n_b_only as decimal(38,0))
                  * (n_a_only - n_b_only) * 1000)
                 div (n_a_only + n_b_only)"""))
          .cast(LongType))
      .orderBy("source")
  }

  /** q_kruskal_wallis — Kruskal–Wallis H across ALL sources at once on
    * document length: the k-sample extension of [[qMannWhitney]] (one
    * omnibus rank test instead of k² pairwise readouts — the right
    * first question when comparing many sources' length profiles).
    * Emits per-source rank sums and deviations plus the corpus H and
    * its tie-corrected form, every number exact-integer.
    *
    * Distributed-exact trick: global midranks come from the VALUE
    * HISTOGRAM, never row sorting — and the histogram's cumulative
    * runs as a TWO-LEVEL decomposition (the X136 pattern): a
    * within-block window partitioned by `v div 4096` (≤ 4096 rows per
    * partition, bounded by construction) plus one block-level window
    * over domain/4096 rows. No unpartitioned corpus-sized sort
    * anywhere; the oracle uses the plain single window (same values —
    * prefix sums are associative). Doubled midranks
    * (midrank2 = 2·|{u<v}| + c_v + 1) keep ties integral.
    *
    * Exactness: H = 3/(N(N+1))·Σᵢ devᵢ²/nᵢ with devᵢ = ranksum2ᵢ −
    * nᵢ(N+1) (the doubled deviation); per-source dev²·10⁶ div n floors
    * once per source (stated contract), tie correction applies as a
    * separate ppm factor so no term needs more than DECIMAL(38,0) —
    * dev² bounds the contract at ~4B rows, where [[bigintExact]]
    * fails loudly in both engines. Degenerate corpora guard: n<2 emits
    * nothing; an all-tied corpus emits a NULL tie-corrected H. */
  val qKruskalWallis: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val base = Tables.documents(s, d)
      .filter(col("n_chars").isNotNull)
      .select(col("source"), col("n_chars").cast(LongType).as("v"))
    val hist = base.groupBy("v").agg(count(lit(1)).as("cv"))
      .localCheckpoint() // feeds ranks, ties, and the total below
    val blocked = hist.withColumn("blk", expr("v div 4096"))
    val wInBlk = Window.partitionBy("blk").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    // block-level window: domain/4096 rows by construction (document
    // lengths, not documents) — the bounded-frame contract
    val wBlk = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkCum = blocked.groupBy("blk").agg(sum("cv").as("bc"))
      .withColumn("bcum", coalesce(sum("bc").over(wBlk), lit(0L)))
    val ranked = blocked
      .withColumn("inblk", coalesce(sum("cv").over(wInBlk), lit(0L)))
      .join(blkCum.select("blk", "bcum"), Seq("blk"))
      .withColumn("midrank2",
        lit(2L) * (col("bcum") + col("inblk")) + col("cv") + lit(1L))
    val tot = hist.agg(sum("cv").cast(LongType).as("n_total"))
      .filter(col("n_total") >= 2)
    val parts = base.groupBy("source", "v").agg(count(lit(1)).as("c"))
      .join(ranked.select("v", "midrank2"), Seq("v"))
      .groupBy("source")
      .agg(sum("c").cast(LongType).as("n"),
        sum(col("c").cast(dec) * col("midrank2")).cast(dec).as("rs2"))
      .crossJoin(broadcast(tot))
      .withColumn("dv",
        col("rs2") - col("n").cast(dec) * (col("n_total").cast(dec) + lit(1L)))
      // coalesce-raise: past ~4B rows dv² overflows DECIMAL(38,0) and
      // Spark's non-ANSI arithmetic yields NULL — which sum() would
      // silently SKIP (a wrong H, not an error). DuckDB's HUGEINT
      // raises at the same magnitude; this keeps the failure symmetric
      // (the ADVICE-r12 loud-bound rule, applied to the mid-pipeline
      // term, not just the final cast).
      .withColumn("dev2_n_micro",
        coalesce(expr("(dv * dv * 1000000) div n"),
          raise_error(concat(lit("kruskal dev^2 overflows decimal(38,0): "),
            col("dv").cast("string"))).cast(dec)))
    val ties = hist.agg(
      sum(expr("cast(cv as decimal(38,0)) * cv * cv - cv")).cast(dec)
        .as("tie_num"))
    val gstat = parts.groupBy("n_total")
      .agg(sum("dev2_n_micro").cast(dec).as("ssum"))
      .withColumn("h_micro",
        expr("(3 * ssum) div (cast(n_total as decimal(38,0)) * (n_total + 1))"))
      .crossJoin(broadcast(ties))
      .withColumn("n3n",
        expr("cast(n_total as decimal(38,0)) * n_total * n_total - n_total"))
      .withColumn("tie_ppm", expr("((n3n - tie_num) * 1000000) div n3n"))
      .select(col("n_total").as("nt"), col("h_micro"), col("tie_ppm"))
    parts.join(broadcast(gstat), col("n_total") === col("nt"))
      .select(col("source"), col("n"),
        bigintExact(col("rs2"), "ranksum2").as("ranksum2"),
        bigintExact(col("dv"), "dev2x").as("dev2x"),
        bigintExact(col("h_micro"), "h_micro").as("h_micro"),
        col("tie_ppm").cast(LongType).as("tie_ppm"),
        when(col("tie_ppm") > 0,
          expr("(h_micro * 1000000) div tie_ppm")).cast(LongType)
          .as("h_tiecorr_micro"))
      .orderBy("source")
  }

  /** q_cramers_v — Cramér's V association between the corpus's two
    * categorical axes (lang × source): the full-grid χ² (expected
    * counts from the margins, ZERO cells included — they carry
    * R·C/N each) and V² = χ²/(N·(min(r,c)−1)). THE one-number answer
    * to "are languages evenly spread across sources, or do sources
    * specialize?" — a mixture design that assumes independence is
    * wrong exactly when V is large.
    *
    * Exact-integer: each cell contributes ((O·N − R·C)²·10⁶) div
    * (N·R·C) — a square over a positive divisor, so Spark's
    * truncating div and DuckDB's flooring // agree; the grid is
    * |langs|×|sources| (bounded dimension tables, broadcast), and V²
    * is emitted rather than V (no sqrt — the determinism contract
    * keeps everything in exact integers). O·N bounds the contract at
    * ~4B rows; [[bigintExact]] fails loudly there. Degenerate 1×c /
    * r×1 tables emit a NULL v2_micro. */
  val qCramersV: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val cells = Tables.documents(s, d)
      .filter(col("lang").isNotNull && col("source").isNotNull)
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      .localCheckpoint() // feeds margins and the grid below
    val rowsT = cells.groupBy("lang").agg(sum("o").cast(LongType).as("r"))
    val colsT = cells.groupBy("source").agg(sum("o").cast(LongType).as("c"))
    val tot = cells.agg(sum("o").cast(LongType).as("n"))
    val dims = rowsT.agg(count(lit(1)).as("nr"))
      .crossJoin(colsT.agg(count(lit(1)).as("nc")))
    val chi = rowsT.crossJoin(broadcast(colsT))
      .join(cells, Seq("lang", "source"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      // coalesce-raise: (O·N−R·C)² overflows DECIMAL(38,0) past ~4B
      // rows and would otherwise NULL out of the sum silently — the
      // same symmetric loud-bound guard as [[qKruskalWallis]]
      .select(coalesce(expr(
        """((cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)
          | * (cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)
          | * 1000000) div (cast(n as decimal(38,0)) * r * c)"""
          .stripMargin),
        raise_error(lit("cramers chi2 term overflows decimal(38,0)"))
          .cast(dec)).as("term"))
      .agg(sum("term").cast(dec).as("chi2m"))
    chi.crossJoin(broadcast(tot)).crossJoin(broadcast(dims))
      .select(col("n"),
        col("nr").cast(LongType).as("n_rows"),
        col("nc").cast(LongType).as("n_cols"),
        bigintExact(col("chi2m"), "chi2_micro").as("chi2_micro"),
        when(least(col("nr"), col("nc")) > 1,
          expr("chi2m div (cast(n as decimal(38,0)) * (least(nr, nc) - 1))"))
          .cast(LongType).as("v2_micro"))
  }

  /** The three keep rules the multi-rater audits score, one frame:
    * rule A and B verbatim from [[qMcnemarFilters]] (stopword-ratio
    * and mean-token-length), rule C a plain length fence
    * (120 ≤ n_chars ≤ 2000). Three INDEPENDENT mechanisms — ratio,
    * shape, size — is what makes their agreement statistics
    * informative rather than circular. */
  private def keepRules3(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").isNotNull && col("n_chars").isNotNull)
      .select(col("source"),
        graft.operators.Packing.wsTokens(col("text")).as("nt"),
        TextStats.nStop4(col("text")).as("ns"),
        col("n_chars").cast(LongType).as("len"))
      .filter(col("nt") >= 1)
      .withColumn("ra",
        (expr("(ns * 100) div nt") >= 3 && col("nt") >= 10).cast(LongType))
      .withColumn("rb",
        (col("nt") >= 10 && expr("len div nt").between(3L, 12L))
          .cast(LongType))
      .withColumn("rc", col("len").between(120L, 2000L).cast(LongType))

  /** q_cochran_q — Cochran's Q omnibus test across the THREE keep
    * rules of [[keepRules3]], per source: do the rules' keep rates
    * differ beyond what their shared per-document randomness explains?
    * The k-rule generalization of [[qMcnemarFilters]] (k=2 McNemar is
    * its special case) — the right gate before swapping any one rule
    * of a cascade, because rule-marginals can differ while the
    * cascade's outcome doesn't, and vice versa.
    *
    * Exact: Q = (k−1)(k·ΣCⱼ² − T²)/(k·T − ΣRᵢ²) with k=3; the
    * numerator is ≥ 0 by Cauchy–Schwarz and the denominator ≥ 0
    * always (Rᵢ ≤ k), so permille division is floor-consistent in
    * both engines; all-unanimous sources (denominator 0) emit NULL.
    * One scan, one |sources|-group rollup. */
  val qCochranQ: Q = (s, d) => {
    keepRules3(s, d)
      .withColumn("r", col("ra") + col("rb") + col("rc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum("ra").cast(LongType).as("keep_a"),
        sum("rb").cast(LongType).as("keep_b"),
        sum("rc").cast(LongType).as("keep_c"),
        sum(expr("r")).cast(LongType).as("t"),
        sum(expr("r * r")).cast(LongType).as("sum_r2"))
      .withColumn("q_milli",
        when(expr("3 * t - sum_r2") > 0,
          expr("""(2 * (3 * (cast(keep_a as decimal(38,0)) * keep_a
                 + cast(keep_b as decimal(38,0)) * keep_b
                 + cast(keep_c as decimal(38,0)) * keep_c)
                 - cast(t as decimal(38,0)) * t) * 1000)
                 div (3 * t - sum_r2)"""))
          .cast(LongType))
      .select("source", "n", "keep_a", "keep_b", "keep_c", "q_milli")
      .orderBy("source")
  }

  /** q_fleiss_kappa — Fleiss' κ inter-rater agreement of the same
    * three keep rules ([[keepRules3]]), per source: the
    * chance-corrected DEGREE of agreement (where [[qCochranQ]] tests
    * for marginal differences — the two are the standard pair of
    * multi-rater readouts). m=3 raters, binary categories: per-doc
    * pair agreement is R(R−1)+(3−R)(2−R) of 6; chance agreement is
    * p² + (1−p)² at the pooled keep rate.
    *
    * Exact: P̄ and P̄ₑ in micros (floored once each — stated
    * contract); κ_milli uses the additive-shift floor
    * ((P̄−P̄ₑ)·1000 + (10⁶−P̄ₑ)·2000) div (10⁶−P̄ₑ) − 2000, so
    * Spark's truncate-toward-zero and DuckDB's floor agree on
    * negative κ (the shift covers κ ≥ −2; binary-m=3 κ is ≥ −½).
    * Perfect-chance sources (P̄ₑ = 10⁶, all docs unanimously one
    * side) emit NULL. */
  val qFleissKappa: Q = (s, d) => {
    keepRules3(s, d)
      .withColumn("r", col("ra") + col("rb") + col("rc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(expr("r")).cast(LongType).as("t"),
        sum(expr("r * (r - 1) + (3 - r) * (2 - r)")).cast(LongType)
          .as("pbar_num"))
      .withColumn("pbar_micro",
        expr("(cast(pbar_num as decimal(38,0)) * 1000000) div (6 * n)")
          .cast(LongType))
      .withColumn("pe_micro",
        expr("""((cast(t as decimal(38,0)) * t
               + (3 * cast(n as decimal(38,0)) - t)
               * (3 * cast(n as decimal(38,0)) - t)) * 1000000)
               div (9 * cast(n as decimal(38,0)) * n)""").cast(LongType))
      .withColumn("kappa_milli",
        when(col("pe_micro") < 1000000L,
          expr("""((pbar_micro - pe_micro) * 1000
                 + (1000000 - pe_micro) * 2000)
                 div (1000000 - pe_micro) - 2000"""))
          .cast(LongType))
      .select("source", "n", "pbar_micro", "pe_micro", "kappa_milli")
      .orderBy("source")
  }

  /** q_mutual_info — mutual information I(lang; source) in micro-bits,
    * with both marginal entropies and the normalized MI
    * (I / min(H_lang, H_source), the [0,1] coefficient). The
    * information-theoretic companion of [[qCramersV]] on the SAME
    * contingency table: V measures departure-from-independence on a
    * χ² scale, MI measures it in bits — "how much does knowing the
    * source tell you about the language" is the number a mixture
    * designer actually wants (a corpus where MI ≈ min-entropy has
    * languages siloed per source; decontamination and mixture
    * balancing behave completely differently there).
    *
    * Determinism: every p·log₂ term floors to micro-bits BEFORE the
    * sum (the [[TextStats.qSourceKl]] contract — identical doubles on
    * both engines against a 1e-6 grid). MI terms can be individually
    * negative; floor (not trunc) agrees across engines for negatives,
    * and both engines spell the identical floor(double) here.
    *
    * Plan: one scan → (lang, source) cell counts (the grid is
    * |langs|·|sources| — bounded); margins and total are rollups OF
    * THE GRID; everything after the first aggregate is result-sized. */
  val qMutualInfo: Q = (s, d) => {
    val cells = Tables.documents(s, d)
      .filter(col("lang").isNotNull && col("source").isNotNull)
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      .localCheckpoint() // feeds margins, total, and the term sum
    val rowsT = cells.groupBy("lang").agg(sum("o").cast(LongType).as("cl"))
    val colsT = cells.groupBy("source").agg(sum("o").cast(LongType).as("cs"))
    val tot = cells.agg(sum("o").cast(LongType).as("n"))
    val mi = cells.join(broadcast(rowsT), "lang")
      .join(broadcast(colsT), "source")
      .crossJoin(broadcast(tot))
      .select(floor(lit(1000000.0)
        * (col("o").cast(DoubleType) / col("n"))
        * log2((col("o").cast(DoubleType) * col("n"))
          / (col("cl").cast(DoubleType) * col("cs"))))
        .cast(LongType).as("term"))
      .agg(sum("term").as("mi_micro"))
    def entropy(m: DataFrame, c: String, out: String): DataFrame =
      m.crossJoin(broadcast(tot))
        .select(floor(lit(1000000.0) * (col(c).cast(DoubleType) / col("n"))
          * log2(col("n").cast(DoubleType) / col(c)))
          .cast(LongType).as("term"))
        .agg(sum("term").as(out))
    mi.crossJoin(entropy(rowsT, "cl", "h_lang_micro"))
      .crossJoin(entropy(colsT, "cs", "h_source_micro"))
      .crossJoin(broadcast(tot))
      .select(col("n").as("n_docs"),
        col("mi_micro").cast(LongType).as("mi_micro"),
        col("h_lang_micro").cast(LongType).as("h_lang_micro"),
        col("h_source_micro").cast(LongType).as("h_source_micro"),
        when(least(col("h_lang_micro"), col("h_source_micro")) > 0,
          expr("(mi_micro * 1000) div least(h_lang_micro, h_source_micro)"))
          .otherwise(lit(0L)).cast(LongType).as("nmi_permille"))
  }

  /** q_spearman_corr — per-source Spearman rank correlation between
    * document length in characters and in whitespace tokens. Length
    * metrics are the cheapest quality signals a pipeline has; how
    * tightly their RANKINGS agree per source (monotone association,
    * which Pearson misses under nonlinearity) tells you whether one
    * can proxy the other in that source's filters — the rank-based
    * sibling of [[qKendallTau]] at one window instead of an O(n²)
    * concordance count.
    *
    * Deterministic permutation variant: ranks are row_number over
    * (metric, doc_id) — the doc_id tiebreak makes both rankings total
    * orders, so ρ = 1 − 6Σd²/(n(n²−1)) is EXACT integer arithmetic
    * (the midrank tie correction would need a √ — this variant stays
    * on the integer grid and is pinned identically in the oracle).
    * Additive-shift floor for the possibly-negative quotient:
    * ((2D − 6Σd²)·10⁶) div D − 10⁶ with D = n(n²−1) > 0, numerator
    * ≥ 0 because Σd² ≤ D/3.
    *
    * Plan: two per-source rank windows sharing one exchange, a
    * |sources|-group sum; Σd² rides DECIMAL(38,0) (n³-scale — wraps
    * int64 past ~2M docs/source). */
  val qSpearmanCorr: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val base = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"), col("n_chars"),
        Packing.wsTokens(col("text")).as("n_tok"))
    val wx = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    val wy = Window.partitionBy("source").orderBy(col("n_tok"), col("doc_id"))
    base
      .withColumn("rx", row_number().over(wx).cast(LongType))
      .withColumn("ry", row_number().over(wy).cast(LongType))
      .withColumn("dd",
        ((col("rx") - col("ry")) * (col("rx") - col("ry"))).cast(dec))
      .groupBy("source")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum("dd").as("sd2"))
      .filter(col("n_docs") >= 2)
      .withColumn("rho_micro", expr(
        """((2 * (cast(n_docs as decimal(38,0)) * n_docs * n_docs - n_docs)
          | - 6 * sd2) * 1000000)
          | div (cast(n_docs as decimal(38,0)) * n_docs * n_docs - n_docs)
          | - 1000000""".stripMargin).cast(LongType))
      .select("source", "n_docs", "rho_micro")
      .orderBy("source")
  }

  val queries: Map[String, Q] = Map(
    "q_mutual_info" -> qMutualInfo,
    "q_spearman_corr" -> qSpearmanCorr,
    "q_kruskal_wallis" -> qKruskalWallis,
    "q_cramers_v" -> qCramersV,
    "q_cochran_q" -> qCochranQ,
    "q_fleiss_kappa" -> qFleissKappa,
    "q_kendall_tau" -> qKendallTau,
    "q_wasserstein_1d" -> qWasserstein1d,
    "q_mcnemar_filters" -> qMcnemarFilters,
    "q_simpson_reversal" -> qSimpsonReversal,
    "q_mann_whitney" -> qMannWhitney,
    "q_roc_auc" -> qRocAuc,
    "q_pr_curve" -> qPrCurve,
    "q_kappa_agreement" -> qKappaAgreement,
    "q_chi2_terms" -> qChi2Terms,
    "q_calibration_bins" -> qCalibrationBins,
    "q_basket_lift" -> qBasketLift,
    "q_ols_trend" -> qOlsTrend)

  val oracle: Map[String, String] = Map(
    "q_mutual_info" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS cl FROM cells GROUP BY 1),
        |ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS cs FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        |mi AS (
        |  SELECT CAST(SUM(CAST(floor(1000000.0
        |      * (CAST(o AS DOUBLE) / n)
        |      * log2((CAST(o AS DOUBLE) * n) / (CAST(cl AS DOUBLE) * cs)))
        |    AS BIGINT)) AS BIGINT) AS mi_micro
        |  FROM cells JOIN rt USING (lang) JOIN ct USING (source)
        |    CROSS JOIN tot),
        |hl AS (
        |  SELECT CAST(SUM(CAST(floor(1000000.0 * (CAST(cl AS DOUBLE) / n)
        |      * log2(CAST(n AS DOUBLE) / cl)) AS BIGINT)) AS BIGINT)
        |    AS h_lang_micro
        |  FROM rt CROSS JOIN tot),
        |hs AS (
        |  SELECT CAST(SUM(CAST(floor(1000000.0 * (CAST(cs AS DOUBLE) / n)
        |      * log2(CAST(n AS DOUBLE) / cs)) AS BIGINT)) AS BIGINT)
        |    AS h_source_micro
        |  FROM ct CROSS JOIN tot)
        |SELECT n AS n_docs, mi_micro, h_lang_micro, h_source_micro,
        |  CAST(CASE WHEN LEAST(h_lang_micro, h_source_micro) > 0
        |    THEN (mi_micro * 1000) // LEAST(h_lang_micro, h_source_micro)
        |    ELSE 0 END AS BIGINT) AS nmi_permille
        |FROM mi CROSS JOIN hl CROSS JOIN hs CROSS JOIN tot""".stripMargin,
    "q_spearman_corr" ->
      """WITH base AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS n_tok
        |  FROM documents WHERE text IS NOT NULL),
        |ranked AS (
        |  SELECT source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rx,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_tok, doc_id) AS ry
        |  FROM base),
        |agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    SUM(CAST(rx - ry AS HUGEINT) * (rx - ry)) AS sd2
        |  FROM ranked GROUP BY 1)
        |SELECT source, n_docs,
        |  CAST(((2 * (CAST(n_docs AS HUGEINT) * n_docs * n_docs - n_docs)
        |    - 6 * sd2) * 1000000)
        |    // (CAST(n_docs AS HUGEINT) * n_docs * n_docs - n_docs)
        |    - 1000000 AS BIGINT) AS rho_micro
        |FROM agg WHERE n_docs >= 2 ORDER BY source""".stripMargin,
    "q_kruskal_wallis" ->
      // the oracle's cumulative is the plain single window; the Spark
      // side runs the two-level blocked decomposition — identical
      // values (prefix sums are associative), different scale story
      """WITH base AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
        |  WHERE n_chars IS NOT NULL),
        |hist AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cv FROM base GROUP BY v),
        |ranked AS (
        |  SELECT v, cv,
        |    2 * COALESCE(SUM(cv) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cv + 1
        |      AS midrank2
        |  FROM hist),
        |tot AS (SELECT CAST(SUM(cv) AS BIGINT) AS n_total FROM hist
        |        HAVING SUM(cv) >= 2),
        |parts AS (
        |  SELECT p.source, p.n, p.ranksum2, p.n_total,
        |    p.ranksum2 - CAST(p.n AS HUGEINT) * (p.n_total + 1) AS dv
        |  FROM (
        |    SELECT b.source, CAST(COUNT(*) AS BIGINT) AS n,
        |      CAST(SUM(r.midrank2) AS HUGEINT) AS ranksum2, n_total
        |    FROM base b JOIN ranked r ON b.v = r.v CROSS JOIN tot
        |    GROUP BY b.source, n_total) p),
        |ties AS (
        |  SELECT CAST(SUM(CAST(cv AS HUGEINT) * cv * cv - cv) AS HUGEINT)
        |    AS tie_num
        |  FROM hist),
        |gstat AS (
        |  SELECT n_total,
        |    (3 * SUM((dv * dv * 1000000) // n))
        |      // (CAST(n_total AS HUGEINT) * (n_total + 1)) AS h_micro,
        |    ((CAST(n_total AS HUGEINT)*n_total*n_total - n_total - tie_num)
        |      * 1000000)
        |      // (CAST(n_total AS HUGEINT)*n_total*n_total - n_total)
        |      AS tie_ppm
        |  FROM parts CROSS JOIN ties GROUP BY n_total, tie_num)
        |SELECT p.source, p.n, CAST(p.ranksum2 AS BIGINT) AS ranksum2,
        |  CAST(p.dv AS BIGINT) AS dev2x,
        |  CAST(g.h_micro AS BIGINT) AS h_micro,
        |  CAST(g.tie_ppm AS BIGINT) AS tie_ppm,
        |  CAST(CASE WHEN g.tie_ppm > 0
        |    THEN (g.h_micro * 1000000) // g.tie_ppm END AS BIGINT)
        |    AS h_tiecorr_micro
        |FROM parts p CROSS JOIN gstat g
        |ORDER BY p.source""".stripMargin,
    "q_cramers_v" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |rows_t AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |cols_t AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        |grid AS (
        |  SELECT rt.r, ct.c, COALESCE(cells.o, 0) AS o
        |  FROM rows_t rt CROSS JOIN cols_t ct
        |  LEFT JOIN cells ON cells.lang = rt.lang AND cells.source = ct.source),
        |chi AS (
        |  SELECT SUM(
        |    ((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |     * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c) * 1000000)
        |    // (CAST(n AS HUGEINT) * r * c)) AS chi2m
        |  FROM grid CROSS JOIN tot),
        |dims AS (SELECT (SELECT COUNT(*) FROM rows_t) AS nr,
        |                (SELECT COUNT(*) FROM cols_t) AS nc)
        |SELECT n, CAST(nr AS BIGINT) AS n_rows, CAST(nc AS BIGINT) AS n_cols,
        |  CAST(chi2m AS BIGINT) AS chi2_micro,
        |  CAST(CASE WHEN LEAST(nr, nc) > 1
        |    THEN chi2m // (CAST(n AS HUGEINT) * (LEAST(nr, nc) - 1)) END
        |    AS BIGINT) AS v2_micro
        |FROM chi CROSS JOIN tot CROSS JOIN dims""".stripMargin,
    "q_cochran_q" -> {
      val nStop = TextStats.nStop4Duck
      s"""WITH rules AS (
        |  SELECT source,
        |    CASE WHEN (n_stop * 100) // nt >= 3 AND nt >= 10
        |      THEN 1 ELSE 0 END AS ra,
        |    CASE WHEN nt >= 10 AND len // nt BETWEEN 3 AND 12
        |      THEN 1 ELSE 0 END AS rb,
        |    CASE WHEN len BETWEEN 120 AND 2000 THEN 1 ELSE 0 END AS rc
        |  FROM (SELECT source,
        |          CAST(length(text) - length(replace(text, ' ', '')) + 1
        |            AS BIGINT) AS nt,
        |          $nStop AS n_stop,
        |          CAST(n_chars AS BIGINT) AS len
        |        FROM documents
        |        WHERE text IS NOT NULL AND n_chars IS NOT NULL)
        |  WHERE nt >= 1),
        |agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(ra) AS BIGINT) AS keep_a,
        |    CAST(SUM(rb) AS BIGINT) AS keep_b,
        |    CAST(SUM(rc) AS BIGINT) AS keep_c,
        |    CAST(SUM(ra + rb + rc) AS BIGINT) AS t,
        |    CAST(SUM((ra + rb + rc) * (ra + rb + rc)) AS BIGINT) AS sum_r2
        |  FROM rules GROUP BY source)
        |SELECT source, n, keep_a, keep_b, keep_c,
        |  CAST(CASE WHEN 3 * t - sum_r2 > 0 THEN
        |    (2 * (3 * (CAST(keep_a AS HUGEINT) * keep_a
        |         + CAST(keep_b AS HUGEINT) * keep_b
        |         + CAST(keep_c AS HUGEINT) * keep_c)
        |         - CAST(t AS HUGEINT) * t) * 1000)
        |    // (3 * t - sum_r2) END AS BIGINT) AS q_milli
        |FROM agg ORDER BY source""".stripMargin
    },
    "q_fleiss_kappa" -> {
      val nStop = TextStats.nStop4Duck
      s"""WITH rules AS (
        |  SELECT source,
        |    (CASE WHEN (n_stop * 100) // nt >= 3 AND nt >= 10
        |       THEN 1 ELSE 0 END)
        |    + (CASE WHEN nt >= 10 AND len // nt BETWEEN 3 AND 12
        |       THEN 1 ELSE 0 END)
        |    + (CASE WHEN len BETWEEN 120 AND 2000 THEN 1 ELSE 0 END) AS r
        |  FROM (SELECT source,
        |          CAST(length(text) - length(replace(text, ' ', '')) + 1
        |            AS BIGINT) AS nt,
        |          $nStop AS n_stop,
        |          CAST(n_chars AS BIGINT) AS len
        |        FROM documents
        |        WHERE text IS NOT NULL AND n_chars IS NOT NULL)
        |  WHERE nt >= 1),
        |agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r) AS BIGINT) AS t,
        |    CAST(SUM(r * (r - 1) + (3 - r) * (2 - r)) AS BIGINT) AS pbar_num
        |  FROM rules GROUP BY source),
        |scaled AS (
        |  SELECT source, n,
        |    CAST((CAST(pbar_num AS HUGEINT) * 1000000) // (6 * n) AS BIGINT)
        |      AS pbar_micro,
        |    CAST(((CAST(t AS HUGEINT) * t
        |         + (3 * CAST(n AS HUGEINT) - t) * (3 * CAST(n AS HUGEINT) - t))
        |         * 1000000)
        |      // (9 * CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_micro
        |  FROM agg)
        |SELECT source, n, pbar_micro, pe_micro,
        |  CAST(CASE WHEN pe_micro < 1000000 THEN
        |    ((CAST(pbar_micro AS HUGEINT) - pe_micro) * 1000
        |     + (1000000 - CAST(pe_micro AS HUGEINT)) * 2000)
        |    // (1000000 - pe_micro) - 2000 END AS BIGINT) AS kappa_milli
        |FROM scaled ORDER BY source""".stripMargin
    },
    "q_kendall_tau" -> {
      val nStop = TextStats.nStop4Duck
      s"""WITH base AS (
        |  SELECT source, n_tokens AS x,
        |    LEAST(((n_stop * 1000) // n_tokens) // 32, 31) AS b
        |  FROM (SELECT source,
        |          CAST(length(text) - length(replace(text, ' ', '')) + 1
        |            AS BIGINT) AS n_tokens,
        |          $nStop AS n_stop
        |        FROM documents WHERE text IS NOT NULL)
        |  WHERE n_tokens >= 1),
        |cells AS (
        |  SELECT source, x, b, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2, 3),
        |fullgrid AS (
        |  SELECT xs.source, xs.x, bb.b, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT source, x FROM cells) xs
        |  CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) bb
        |  LEFT JOIN cells c
        |    ON c.source = xs.source AND c.x = xs.x AND c.b = bb.b),
        |dom1 AS (
        |  SELECT source, x, b, c,
        |    COALESCE(SUM(c) OVER (PARTITION BY source, b ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lessb
        |  FROM fullgrid),
        |dom2 AS (
        |  SELECT source, x, b, c, lessb,
        |    COALESCE(SUM(lessb) OVER (PARTITION BY source, x ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefb,
        |    SUM(lessb) OVER (PARTITION BY source, x) AS totless
        |  FROM dom1),
        |pq AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
        |    SUM(CAST(c AS HUGEINT) * prefb) AS p,
        |    SUM(CAST(c AS HUGEINT) * (totless - lessb - prefb)) AS q
        |  FROM dom2 GROUP BY 1),
        |tx AS (
        |  SELECT source,
        |    CAST(SUM(CAST(cx AS HUGEINT) * (cx - 1) // 2) AS BIGINT) AS n_ties_x
        |  FROM (SELECT source, x, CAST(COUNT(*) AS BIGINT) AS cx
        |        FROM base GROUP BY 1, 2)
        |  GROUP BY 1),
        |ty AS (
        |  SELECT source,
        |    CAST(SUM(CAST(cb AS HUGEINT) * (cb - 1) // 2) AS BIGINT) AS n_ties_y
        |  FROM (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS cb
        |        FROM base GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT pq.source, n, CAST(p AS BIGINT) AS n_conc,
        |  CAST(q AS BIGINT) AS n_disc, n_ties_x, n_ties_y,
        |  CAST(((p - q) * 1000 + (CAST(n AS HUGEINT) * (n - 1) // 2) * 1001)
        |    // (CAST(n AS HUGEINT) * (n - 1) // 2) - 1001 AS BIGINT)
        |    AS tau_a_permille
        |FROM pq JOIN tx USING (source) JOIN ty USING (source)
        |WHERE n >= 2 ORDER BY source""".stripMargin
    },
    "q_wasserstein_1d" ->
      """WITH hist AS (
        |  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |srcs AS (SELECT DISTINCT source FROM hist),
        |pairs AS (
        |  SELECT a.source AS sa, b.source AS sb
        |  FROM srcs a JOIN srcs b ON a.source < b.source),
        |merged AS (
        |  SELECT sa, sb, v, SUM(c1) AS c1, SUM(c2) AS c2 FROM (
        |    SELECT p.sa, p.sb, h.v, h.c AS c1, 0 AS c2
        |    FROM pairs p JOIN hist h ON h.source = p.sa
        |    UNION ALL
        |    SELECT p.sa, p.sb, h.v, 0, h.c
        |    FROM pairs p JOIN hist h ON h.source = p.sb)
        |  GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT sa, sb, v,
        |    SUM(c1) OVER w AS cuma, SUM(c2) OVER w AS cumb,
        |    SUM(c1) OVER (PARTITION BY sa, sb) AS na,
        |    SUM(c2) OVER (PARTITION BY sa, sb) AS nb,
        |    lead(v) OVER (PARTITION BY sa, sb ORDER BY v) AS nextv
        |  FROM merged
        |  WINDOW w AS (PARTITION BY sa, sb ORDER BY v
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT sa AS source_a, sb AS source_b,
        |  CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
        |  CAST(SUM(CASE WHEN nextv IS NOT NULL THEN
        |        abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
        |          * (nextv - v)
        |      ELSE 0 END) * 1000
        |    // (CAST(MAX(na) AS HUGEINT) * MAX(nb)) AS BIGINT) AS w1_milli
        |FROM cum GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,
    "q_mcnemar_filters" -> {
      val nStop = TextStats.nStop4Duck
      s"""WITH flagged AS (
        |  SELECT source,
        |    ((n_stop * 100) // n_tokens >= 3 AND n_tokens >= 10) AS ka,
        |    (n_tokens >= 10 AND len // n_tokens BETWEEN 3 AND 12) AS kb
        |  FROM (SELECT source,
        |          CAST(length(text) - length(replace(text, ' ', '')) + 1
        |            AS BIGINT) AS n_tokens,
        |          $nStop AS n_stop,
        |          CAST(n_chars AS BIGINT) AS len
        |        FROM documents
        |        WHERE text IS NOT NULL AND n_chars IS NOT NULL)
        |  WHERE n_tokens >= 1),
        |agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN ka AND kb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_both,
        |    CAST(SUM(CASE WHEN ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a_only,
        |    CAST(SUM(CASE WHEN NOT ka AND kb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b_only,
        |    CAST(SUM(CASE WHEN NOT ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_neither
        |  FROM flagged GROUP BY 1)
        |SELECT source, n, n_both, n_a_only, n_b_only, n_neither,
        |  CAST(((n_both + n_neither) * 1000) // n AS BIGINT) AS agree_permille,
        |  CASE WHEN n_a_only + n_b_only > 0 THEN
        |    CAST((CAST(n_a_only - n_b_only AS HUGEINT) * (n_a_only - n_b_only)
        |      * 1000) // (n_a_only + n_b_only) AS BIGINT)
        |  END AS mcnemar_permille
        |FROM agg ORDER BY source""".stripMargin
    },
    "q_simpson_reversal" -> {
      val nStop = TextStats.nStop4Duck
      s"""WITH h AS (
        |  SELECT source, lang, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN (n_stop * 100) // n_tokens >= 3
        |          AND n_tokens >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM (SELECT source, lang,
        |          CAST(length(text) - length(replace(text, ' ', '')) + 1
        |            AS BIGINT) AS n_tokens,
        |          $nStop AS n_stop
        |        FROM documents WHERE text IS NOT NULL)
        |  GROUP BY 1, 2),
        |strat AS (
        |  SELECT a.source AS sa, b.source AS sb, a.lang,
        |    a.n AS na, a.k AS ka, b.n AS nb, b.k AS kb,
        |    CASE WHEN CAST(a.k AS HUGEINT) * b.n > CAST(b.k AS HUGEINT) * a.n
        |           THEN 1
        |         WHEN CAST(a.k AS HUGEINT) * b.n < CAST(b.k AS HUGEINT) * a.n
        |           THEN -1 ELSE 0 END AS v
        |  FROM h a JOIN h b ON a.lang = b.lang AND a.source < b.source),
        |agg AS (
        |  SELECT sa, sb, COUNT(*) AS n_strata,
        |    CAST(SUM(na) AS HUGEINT) AS tna, CAST(SUM(ka) AS HUGEINT) AS tka,
        |    CAST(SUM(nb) AS HUGEINT) AS tnb, CAST(SUM(kb) AS HUGEINT) AS tkb,
        |    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a_wins,
        |    CAST(SUM(CASE WHEN v = -1 THEN 1 ELSE 0 END) AS BIGINT) AS b_wins,
        |    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ties
        |  FROM strat GROUP BY 1, 2),
        |verd AS (
        |  SELECT *, CASE WHEN tka * tnb > tkb * tna THEN 1
        |                 WHEN tka * tnb < tkb * tna THEN -1
        |                 ELSE 0 END AS pv
        |  FROM agg)
        |SELECT sa AS source_a, sb AS source_b, n_strata,
        |  CAST(pv AS BIGINT) AS pooled_verdict,
        |  CAST(CASE WHEN pv = 1 THEN a_wins WHEN pv = -1 THEN b_wins
        |       ELSE 0 END AS BIGINT) AS n_agree,
        |  CAST(CASE WHEN pv = 1 THEN b_wins WHEN pv = -1 THEN a_wins
        |       ELSE 0 END AS BIGINT) AS n_reversed,
        |  n_ties,
        |  (pv <> 0 AND (CASE WHEN pv = 1 THEN b_wins ELSE a_wins END)
        |    > (CASE WHEN pv = 1 THEN a_wins ELSE b_wins END)) AS simpson_flag
        |FROM verd ORDER BY source_a, source_b""".stripMargin
    },
    "q_mann_whitney" ->
      """WITH hist AS (
        |  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |srcs AS (SELECT DISTINCT source FROM hist),
        |pairs AS (
        |  SELECT a.source AS sa, b.source AS sb
        |  FROM srcs a JOIN srcs b ON a.source < b.source),
        |merged AS (
        |  SELECT sa, sb, v, SUM(c1) AS c1, SUM(c2) AS c2 FROM (
        |    SELECT p.sa, p.sb, h.v, h.c AS c1, 0 AS c2
        |    FROM pairs p JOIN hist h ON h.source = p.sa
        |    UNION ALL
        |    SELECT p.sa, p.sb, h.v, 0, h.c
        |    FROM pairs p JOIN hist h ON h.source = p.sb)
        |  GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT sa, sb, v, c1, c2,
        |    SUM(c1 + c2) OVER (PARTITION BY sa, sb ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) - (c1 + c2) AS cb
        |  FROM merged),
        |agg AS (
        |  SELECT sa, sb,
        |    CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
        |    SUM(CAST(c1 AS HUGEINT) * (2 * cb + (c1 + c2) + 1)) AS r1x2
        |  FROM cum GROUP BY 1, 2)
        |SELECT sa AS source_a, sb AS source_b, n1, n2,
        |  CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS u2x,
        |  CAST(((r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1)) * 500)
        |    // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS cles_permille
        |FROM agg ORDER BY source_a, source_b""".stripMargin,
    "q_roc_auc" ->
      """WITH docs AS (
        |  SELECT source, n_chars AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE text IS NOT NULL),
        |ranked AS (
        |  SELECT source, y,
        |    2 * rank() OVER (PARTITION BY source ORDER BY score)
        |      + count(*) OVER (PARTITION BY source, score) - 1 AS mr2
        |  FROM docs),
        |agg AS (
        |  SELECT source,
        |    CAST(SUM(y) AS BIGINT) AS n_pos,
        |    CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg,
        |    SUM(CASE WHEN y = 1 THEN mr2 ELSE 0 END) AS smr2
        |  FROM ranked GROUP BY source)
        |SELECT source, n_pos, n_neg,
        |  CAST(((smr2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000)
        |       // (CAST(2 AS HUGEINT) * n_pos * n_neg) AS BIGINT) AS auc_micro
        |FROM agg WHERE n_pos > 0 AND n_neg > 0 ORDER BY source""".stripMargin,
    "q_pr_curve" ->
      """WITH docs AS (
        |  SELECT source, doc_id, n_chars AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE text IS NOT NULL),
        |ranked AS (
        |  SELECT source, y,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM docs),
        |buckets AS (
        |  SELECT source, ((rn - 1) * 10) // n + 1 AS decile,
        |    COUNT(*) AS n_b, SUM(y) AS pos_b
        |  FROM ranked GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, CAST(decile AS BIGINT) AS decile,
        |    SUM(n_b) OVER (PARTITION BY source ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k,
        |    SUM(pos_b) OVER (PARTITION BY source ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |    SUM(pos_b) OVER (PARTITION BY source) AS n_pos
        |  FROM buckets)
        |SELECT source, decile, CAST(k AS BIGINT) AS k,
        |  CAST(tp AS BIGINT) AS tp,
        |  CAST((tp * 1000) // k AS BIGINT) AS precision_permille,
        |  CAST((tp * 1000) // GREATEST(n_pos, 1) AS BIGINT)
        |    AS recall_permille
        |FROM cum ORDER BY source, decile""".stripMargin,
    "q_kappa_agreement" -> {
      val cThe = TextStats.occurrencesDuck("text", "the")
      val cData = TextStats.occurrencesDuck("text", "data")
      val cScan = TextStats.occurrencesDuck("text", "scan")
      val cJoin = TextStats.occurrencesDuck("text", "join")
      s"""WITH m AS (
        |  SELECT doc_id, $cThe AS c_the, $cData AS c_data,
        |    $cScan AS c_scan, $cJoin AS c_join
        |  FROM documents WHERE text IS NOT NULL),
        |cls AS (
        |  SELECT
        |    CASE WHEN c_the >= c_data AND c_the >= c_scan AND c_the >= c_join
        |           THEN 'en'
        |         WHEN c_data >= c_scan AND c_data >= c_join THEN 'dat'
        |         WHEN c_scan >= c_join THEN 'scn' ELSE 'jon' END AS ca,
        |    CASE WHEN c_join >= c_scan AND c_join >= c_data AND c_join >= c_the
        |           THEN 'jon'
        |         WHEN c_scan >= c_data AND c_scan >= c_the THEN 'scn'
        |         WHEN c_data >= c_the THEN 'dat' ELSE 'en' END AS cb
        |  FROM m),
        |cells AS (SELECT ca, cb, COUNT(*) AS n FROM cls GROUP BY ca, cb),
        |ra AS (SELECT ca, SUM(n) AS na FROM cells GROUP BY ca),
        |cbm AS (SELECT cb, SUM(n) AS nb FROM cells GROUP BY cb),
        |pe AS (
        |  SELECT SUM(CAST(na AS HUGEINT) * nb) AS pe_num
        |  FROM ra JOIN cbm ON ra.ca = cbm.cb),
        |tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN ca = cb THEN n ELSE 0 END) AS BIGINT) AS n_agree
        |  FROM cells)
        |SELECT n_docs, n_agree,
        |  CAST((n_agree * 1000) // n_docs AS BIGINT) AS po_permille,
        |  CAST(((CAST(n_docs AS HUGEINT) * n_agree - pe_num) * 1000000)
        |       // (CAST(n_docs AS HUGEINT) * n_docs - pe_num) AS BIGINT)
        |    AS kappa_micro
        |FROM tot, pe""".stripMargin
    },
    "q_chi2_terms" ->
      """WITH docs AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, text
        |  FROM documents WHERE text IS NOT NULL),
        |totals AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
        |  FROM docs),
        |terms AS (
        |  SELECT y, unnest(list_distinct(
        |    list_filter(string_split(text, ' '), w -> length(w) > 0))) AS w
        |  FROM docs),
        |per_term AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(y) AS BIGINT) AS a
        |  FROM terms GROUP BY w HAVING COUNT(*) >= 5)
        |SELECT w AS word, df, a AS df_en,
        |  CAST((CAST(n AS HUGEINT)
        |        * (CAST(a AS HUGEINT) * (n - n_pos - df + a)
        |           - CAST(df - a AS HUGEINT) * (n_pos - a))
        |        * (CAST(a AS HUGEINT) * (n - n_pos - df + a)
        |           - CAST(df - a AS HUGEINT) * (n_pos - a))
        |        * 1000000)
        |       // (CAST(df AS HUGEINT) * (n - df) * n_pos * (n - n_pos))
        |    AS BIGINT) AS chi2_micro,
        |  CASE WHEN CAST(a AS HUGEINT) * (n - n_pos - df + a)
        |            > CAST(df - a AS HUGEINT) * (n_pos - a)
        |       THEN 'en' ELSE 'rest' END AS enriched_in
        |FROM per_term, totals
        |WHERE df < n AND n_pos > 0 AND n_pos < n
        |ORDER BY chi2_micro DESC, word LIMIT 20""".stripMargin,
    "q_calibration_bins" ->
      """WITH scored AS (
        |  SELECT LEAST(1000, (n_chars * 1000) // 600) AS pred_permille,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT CAST(LEAST(9, pred_permille // 100) AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(pred_permille) // COUNT(*) AS BIGINT) AS mean_pred_permille,
        |  CAST((SUM(y) * 1000) // COUNT(*) AS BIGINT) AS obs_pos_permille
        |FROM scored GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_basket_lift" ->
      """WITH items AS (
        |  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM items),
        |freq AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
        |         FROM items GROUP BY item),
        |pairs AS (
        |  SELECT x.item AS item_a, y.item AS item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM items x JOIN items y ON x.o = y.o AND x.item < y.item
        |  GROUP BY x.item, y.item HAVING COUNT(*) >= 5)
        |SELECT item_a, item_b, n_ab,
        |  CAST((n_ab * 1000) // n_orders AS BIGINT) AS support_permille,
        |  CAST((n_ab * 1000) // fa.n_item AS BIGINT) AS conf_permille,
        |  CAST((CAST(n_ab AS HUGEINT) * n_orders * 1000000)
        |       // (CAST(fa.n_item AS HUGEINT) * fb.n_item) AS BIGINT) AS lift_micro
        |FROM pairs
        |JOIN freq fa ON pairs.item_a = fa.item
        |JOIN freq fb ON pairs.item_b = fb.item, n
        |ORDER BY lift_micro DESC, item_a, item_b LIMIT 20""".stripMargin,
    "q_ols_trend" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(epoch_ms(ts) // 1000 - 1704067200 AS HUGEINT) AS x,
        |    CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT) AS y
        |  FROM events),
        |sums AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
        |  FROM ev GROUP BY event_type)
        |SELECT event_type, n_events,
        |  CAST(((n * sxy - sx * sy) * 86400 * 1000000)
        |       // (n * sxx - sx * sx) AS BIGINT) AS slope_micro_cents_per_day,
        |  CAST((sy * sxx - sx * sxy) // (n * sxx - sx * sx) AS BIGINT)
        |    AS intercept_cents
        |FROM sums WHERE n * sxx - sx * sx != 0
        |ORDER BY event_type""".stripMargin)
}
