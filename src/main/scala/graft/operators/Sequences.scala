package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables
import graft.functions.Exprs.{dec2, intScaled, md5Long, md5LongHalf, nanosToSec}

/** Event-sequence mining over the status/event stream.
  *
  * The reference's status table is an append-only event log
  * (storcrawl.py:357-372 inserts one row per heartbeat; report.py
  * reads it back ordered by time). Once a log like that exists, the
  * questions users ask of it go beyond per-window rollups: how do
  * users MOVE between event types (transition matrix), how many
  * distinct actors does each hour see (windowed distinct), and what
  * is a noise-robust trailing estimate of a per-user metric
  * (decayed smoothing). Each is a classic log-analytics operator and
  * each maps to one well-shaped Spark plan.
  *
  * Scale shape, shared by all three: the only wide exchange is the
  * hash partition on `user_id` (or the hour bucket) — the natural key
  * of the log, high-cardinality and skew-free by construction. No
  * broadcasts of unbounded sides, no global windows; a 100 TB event
  * log runs these with exactly one shuffle each plus a final
  * result-sized sort.
  */
object Sequences {

  type Q = (SparkSession, String) => DataFrame

  /** Events keyed and ordered the way every sequence operator needs:
    * (user_id, ts_sec, event_id) with the cents-scaled value. The
    * (ts_sec, event_id) compound order is total — event_id is unique —
    * so window frames are deterministic even when heartbeats share a
    * second. */
  private def seqEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      nanosToSec(col("ts")).as("ts_sec"),
      intScaled(dec2(col("value")), 100L).as("v_cents"))

  /** q_event_transitions — the first-order Markov transition matrix of
    * the event-type sequence: for each ordered pair (prev_type,
    * next_type) of CONSECUTIVE events of one user, how many
    * transitions happened and how many distinct users ever made that
    * hop. This is the session-flow report of product analytics and the
    * state-machine sanity check of a crawler log (a `crawl_end` that
    * transitions into anything but `report_start` is a bug).
    *
    * Plan: one shuffle on user_id for the lag window, then a hash
    * aggregate on the 25-cell (prev, next) key — partial map-side,
    * distinct-user count expands to (pair, user) partials first. No
    * other exchange. */
  val qEventTransitions: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        nanosToSec(col("ts")).as("ts_sec"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("prev_type", "next_type")
  }

  /** q_window_distinct — hourly tumbling windows with exact distinct
    * actors: per hour bucket, event count, distinct users, distinct
    * event types, and the cents-scaled value sum. The "how many unique
    * visitors this hour" query — the exact-count twin of the HLL
    * sketch family (SketchSpec proves the mergeable approximation;
    * this is the oracle-checkable ground truth at one shuffle).
    *
    * Plan: COUNT(DISTINCT) expands to a two-phase aggregate on
    * (bucket, user) then (bucket) — both partial map-side; the bucket
    * key is time, so partitions are balanced by construction. */
  val qWindowDistinct: Q = (s, d) =>
    seqEvents(s, d)
      .withColumn("hour_bucket", expr("(ts_sec div 3600) * 3600").cast(LongType))
      .groupBy("hour_bucket")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_id")).as("n_distinct_events"),
        sum(col("v_cents")).cast(LongType).as("sum_cents"))
      .orderBy("hour_bucket")

  /** q_ewma_trailing — binary-decay trailing smoothing of the per-user
    * value series: weights 8/4/2/1 over the current event and its
    * three predecessors (an EWMA with α=1/2 truncated at 4 taps — the
    * truncation keeps every term an exact integer, so the oracle
    * matches bit-for-bit where a float-decay EWMA could not). Ramp-up
    * is handled by shrinking the denominator to the weights actually
    * present, so the first event of a user is its own estimate, not a
    * zero-padded underestimate.
    *
    * Plan: one shuffle on user_id; the three lags share one window
    * frame (single WindowExec); everything above is a projection. */
  val qEwmaTrailing: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"), col("event_id"))
    def lagc(k: Int): Column = lag(col("v_cents"), k).over(w)
    seqEvents(s, d)
      .withColumn("num",
        (col("v_cents") * 8 + coalesce(lagc(1), lit(0L)) * 4
          + coalesce(lagc(2), lit(0L)) * 2 + coalesce(lagc(3), lit(0L))).cast(LongType))
      .withColumn("den",
        (lit(8L) + when(lagc(1).isNotNull, 4L).otherwise(0L)
          + when(lagc(2).isNotNull, 2L).otherwise(0L)
          + when(lagc(3).isNotNull, 1L).otherwise(0L)).cast(LongType))
      .select(col("user_id"), col("event_id"), col("ts_sec"), col("v_cents"),
        expr("num div den").cast(LongType).as("smooth_cents"))
      .orderBy("user_id", "event_id")
  }

  /** q_burst_users — burstiness ranking: per (user, hour) event
    * counts, rolled up per user to hottest-hour share (integer
    * permille — no float division), ranked to the 10 burstiest users.
    * The scripted-client / crawl-loop screen over the reference's
    * heartbeat log: a user whose single hottest hour carries most of
    * their activity is a machine, not a person. Ranked (not
    * thresholded) because the interesting set is the TAIL, whatever
    * absolute level the corpus happens to have.
    *
    * Plan: two hash aggregates — (user, hour) then (user) — both
    * partial map-side on the same user-keyed exchange; the top-10
    * plans as TakeOrdered over the per-user aggregate (no global
    * sort). */
  val qBurstUsers: Q = (s, d) =>
    seqEvents(s, d)
      .withColumn("hour_bucket", expr("ts_sec div 3600").cast(LongType))
      .groupBy("user_id", "hour_bucket")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(sum(col("n")).cast(LongType).as("n_events"),
        max(col("n")).cast(LongType).as("max_hour"),
        countDistinct(col("hour_bucket")).as("n_hours"))
      .withColumn("burst_permille",
        expr("(max_hour * 1000) div n_events").cast(LongType))
      .orderBy(col("burst_permille").desc, col("user_id"))
      .limit(10)
      .select("user_id", "n_events", "max_hour", "n_hours", "burst_permille")

  /** q_conversion_rate — Laplace-smoothed per-user conversion odds:
    * purchases over views with add-one/add-two smoothing,
    * `(n_purchase + 1) · 1000 div (n_view + 2)` — the additive prior
    * keeps a 1-view-1-purchase user from scoring 1000‰ certainty, the
    * classic small-count fix, and keeps the metric exact-integer. The
    * funnel's scalar summary: one number per user instead of per-step
    * rows.
    *
    * Plan: one conditional-counter hash aggregate on user_id (partial
    * map-side); the smoothing is post-aggregate arithmetic. */
  val qConversionRate: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .cast(LongType).as("n_view"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast(LongType).as("n_purchase"))
      .withColumn("rate_permille",
        expr("((n_purchase + 1) * 1000) div (n_view + 2)").cast(LongType))
      .orderBy("user_id")

  /** q_ab_test — deterministic experiment readout: users split into
    * two arms by `md5Long('ab|' || user_id) mod 2` (the hash-bucketed
    * assignment every experimentation system uses — sticky across
    * sessions, reproducible across retries, no assignment table), then
    * per-arm exposure and outcome totals: distinct users, events,
    * cents-scaled value sum, integer mean, and purchase share in
    * permille. The A/B readout every event pipeline grows.
    *
    * Plan: the arm is scan-side arithmetic; one 2-group conditional
    * aggregate (distinct-user expansion two-phase as usual). */
  val qAbTest: Q = (s, d) =>
    Tables.events(s, d)
      .select(
        when(pmod(md5Long(concat(lit("ab|"), col("user_id").cast("string"))),
          lit(2L)) === 0, "A").otherwise("B").as("arm"),
        col("user_id"), col("event_type"),
        intScaled(dec2(col("value")), 100L).as("v_cents"))
      .groupBy("arm")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(col("v_cents")).cast(LongType).as("sum_cents"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast(LongType).as("n_purchase"))
      .withColumn("mean_cents", expr("sum_cents div n_events").cast(LongType))
      .withColumn("purchase_permille",
        expr("(n_purchase * 1000) div n_events").cast(LongType))
      .orderBy("arm")

  /** Poisson(1) CDF thresholds on the 2¹⁵ hash grid: a 15-bit uniform
    * u maps to a bootstrap weight w = |{k : u ≥ floor(P(X ≤ k)·2¹⁵)}|
    * ∈ [0, 5] — inverse-CDF sampling with the tail mass past 5
    * (3.7×10⁻³) folded into w = 5. The 15-bit grid quantizes each
    * threshold by <2⁻¹⁵ (immaterial next to bootstrap noise) and lets
    * ONE md5 feed eight draws: hex chars [1,15] and [17,31] parse to
    * two 60-bit longs, each yielding four 15-bit fields by div/mod —
    * so 8 md5 calls per row replace the former 64 (the md5-on-concat
    * was ~all of this query's scan-stage CPU). Integer constants, so
    * Spark and DuckDB draw bit-identical weights. */
  private val poissonCdf15 = Seq(12054L, 24109L, 30136L, 32145L, 32648L)

  /** 32768^slot divisors for the four 15-bit fields of a 60-bit long. */
  private val slotDiv = Seq(1L, 32768L, 1073741824L, 35184372088832L)

  /** q_bootstrap_ci — Poisson-bootstrap confidence intervals for the
    * mean event value per event_type: the DISTRIBUTED bootstrap
    * (Chamandy et al., Google 2012 "Estimating Uncertainty for
    * Massive Data Streams"; the streaming-bootstrap standard). A
    * classical resample draws n of n WITH replacement — impossible
    * without global coordination — but each row's multiplicity in one
    * resample is asymptotically Poisson(1), which IS per-row-
    * independent: every row draws 64 deterministic hash-weights and
    * the resample means fall out of one aggregation.
    *
    * The 2.5th/97.5th-ish bounds are the 2nd and 63rd order statistics
    * of the 64 resample means (a ~95% percentile-bootstrap interval).
    * All integer: cents values, truncating means, hash weights.
    *
    * Plan: one scan fans out ×64 (posexplode of a PRE-HASHED 64-draw
    * array — map-side, no shuffle, and the md5 work is 8 calls per
    * row, not 64), partial-aggregated into (event_type, b) sums — the
    * ONLY corpus-sized exchange, 64·|types| groups out. The order
    * statistics ride a 64-row-per-type window; the point estimate
    * joins from the same pre-aggregated frame. At 100 TB: B×
    * amplification happens inside the scan stage and collapses to
    * 64·|types| rows before anything moves — the textbook reason
    * Poisson bootstrap replaced resample-and-reshuffle. */
  val qBootstrapCi: Q = (s, d) => {
    // w as ONE descending CASE, not five CAST(u >= t)+… terms: the sum
    // form pushed this stage's generated method past HotSpot's 8 KB
    // JIT ceiling (DontCompileHugeMethods) — still "codegen'd" but
    // bytecode-interpreted, 5.4 s vs 1.8 s at sf0.1 (min-of-3, A/B'd)
    val wExpr = "CASE " + poissonCdf15.zipWithIndex.reverse.map {
      case (t, k) => s"WHEN u >= ${t}L THEN ${k + 1}" }.mkString(" ") +
      " ELSE 0 END"
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        intScaled(dec2(col("value")), 100L).as("v_cents"))
    val point = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        expr("sum(v_cents) div count(1)").cast(LongType).as("mean_cents"))
    // draw b = 8j + i comes from md5 #j: long m = 2j + i/4 (hex chars
    // [1,15] then [17,31], the two Md5Long60 halves — native digest
    // reads, no hex/conv round-trip; r16), 15-bit field i%4 of that long
    val longs = (0 until 16).map { m =>
      val j = m / 2
      md5LongHalf(concat(col("event_id").cast("string"),
        lit(s"|boot|$j")), m % 2).as(s"L$m")
    }
    val draws = (0 until 64).map { b =>
      val i = b % 8
      val m = (b / 8) * 2 + i / 4
      expr(s"(L$m div ${slotDiv(i % 4)}L) % 32768L")
    }
    val means = ev
      .select(col("event_type") +: col("v_cents") +: longs: _*)
      .select(col("event_type"), col("v_cents"),
        posexplode(array(draws: _*)).as(Seq("b", "u")))
      .withColumn("w", expr(wExpr))
      .groupBy("event_type", "b")
      .agg(sum(expr("w * v_cents")).cast(LongType).as("wsum"),
        sum(col("w")).cast(LongType).as("wn"))
      // a zero-weight resample is possible only for O(1)-row types
      // (P ≈ e^(−n)); dropping it shifts the order statistics by at
      // most its own rank, and keeps the division total
      .filter(col("wn") > 0)
      .withColumn("mean_b", expr("wsum div wn"))
    val wOrd = Window.partitionBy("event_type").orderBy("mean_b", "b")
    val ci = means.withColumn("rn", row_number().over(wOrd))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_resamples"),
        min(when(col("rn") === 2, col("mean_b"))).cast(LongType).as("ci_lo_cents"),
        min(when(col("rn") === 63, col("mean_b"))).cast(LongType).as("ci_hi_cents"))
    point.join(ci, Seq("event_type"))
      .select(col("event_type"), col("n_rows"), col("mean_cents"),
        col("n_resamples"), col("ci_lo_cents"), col("ci_hi_cents"))
      .orderBy("event_type")
  }

  /** q_funnel_time — time-to-convert: for each user whose first
    * purchase follows their first view, the view→purchase delay in
    * seconds, rolled up to conversion count and exact p50/p90 delays.
    * The latency companion of the step-count funnel (X53): the funnel
    * says HOW MANY convert, this says HOW FAST.
    *
    * Plan: per-user conditional MIN aggregate (one user-keyed
    * exchange), then a single `percentile_disc` aggregate over the
    * converted-user rows — exact, and the input to the final
    * aggregate is already user-level (tiny). */
  val qFunnelTime: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), nanosToSec(col("ts")).as("ts_sec"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts_sec"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts_sec"))).as("first_purchase"))
      .filter(col("first_view").isNotNull && col("first_purchase").isNotNull
        && col("first_purchase") >= col("first_view"))
      .withColumn("delay_sec", (col("first_purchase") - col("first_view")).cast(LongType))
      .agg(count(lit(1)).as("n_converted"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_sec) AS BIGINT)")
          .as("p50_sec"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_sec) AS BIGINT)")
          .as("p90_sec"))

  /** q_interval_overlap — interval join, the scalable way: per-user
    * activity sessions (day-gap rule on the [[qEventTransitions]]
    * spine) joined against corpus-wide incident windows (hours with
    * ≥ 2 error events), reporting each (session, incident) overlap in
    * seconds. The naive spelling is a range-predicate join — O(|A|·|B|)
    * as a BroadcastNestedLoop — so the engine side EXPANDS each
    * session to the hour buckets it covers and equi-joins on the
    * bucket: one hash shuffle, expansion bounded by session length
    * over bucket width (pick the bucket ≈ median interval length at
    * production scale). The DuckDB twin runs the NAIVE range join —
    * the hash equality proves the bucketed rewrite is exactly the
    * interval join, not an approximation of it.
    *
    * Plan: sessionize = one user-keyed window chain; incidents = one
    * tiny time-keyed aggregate; the join is bucket-equi (shuffle on
    * the hour key) + a residual overlap filter. No BNLJ anywhere. */
  val qIntervalOverlap: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"), col("event_id"))
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        nanosToSec(col("ts")).as("ts_sec"), col("event_type"))
      .withColumn("prev", lag(col("ts_sec"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("ts_sec") - col("prev") > 86400, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast(LongType))
      .groupBy("user_id", "session_idx")
      .agg(min(col("ts_sec")).cast(LongType).as("s_start"),
        max(col("ts_sec")).cast(LongType).as("s_end"))
    val incidents = Tables.events(s, d)
      .filter(col("event_type") === "error")
      .select(nanosToSec(col("ts")).as("ts_sec"))
      .select(expr("ts_sec div 3600").cast(LongType).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n_err"))
      .filter(col("n_err") >= 2)
      .select(col("b"), (col("b") * 3600).as("i_start"),
        (col("b") * 3600 + 3599).as("i_end"))
    sess
      .withColumn("b",
        explode(sequence(expr("s_start div 3600"), expr("s_end div 3600"))))
      .join(incidents, Seq("b"))
      .select(col("user_id"), col("session_idx"),
        col("b").cast(LongType).as("incident_bucket"),
        (least(col("s_end"), col("i_end"))
          - greatest(col("s_start"), col("i_start")) + 1)
          .cast(LongType).as("overlap_sec"))
      .filter(col("overlap_sec") > 0)
      .orderBy("user_id", "session_idx", "incident_bucket")
  }

  /** q_concurrency_curve — peak concurrent sessions per week bucket,
    * by the two-level parallel prefix-sum decomposition: sessions
    * ([[Reports.qSessionize]]'s 7-day-gap rule) emit +1/−1 boundary
    * deltas; WITHIN each bucket a bucket-keyed window computes the
    * local running sum and its max; ACROSS buckets only the per-bucket
    * NET totals enter a cumulative carry (a window over |buckets| ≈
    * hundreds of rows), and peak(b) = carry(b) + local-max(b). This is
    * the classic scan decomposition that makes a sequential sweep-line
    * admissible on a cluster: the corpus-sized window partitions on
    * the bucket key, and the only global-order pass runs over bucket
    * summaries — the [[TextStats.qHeapsCurve]] trick applied to
    * interval concurrency. The DuckDB twin runs the NAIVE single
    * global running sum — hash equality proves the decomposition
    * exactly reproduces the sequential sweep (the X120/X126/X132 proof
    * pattern). Tie rule pinned: at equal timestamps, −1 sorts before
    * +1 (dv ascending), so back-to-back sessions never double-count.
    * The capacity-planning number of a crawl/serving fleet. */
  val qConcurrencyCurve: Q = (s, d) => {
    val sess = Reports.qSessionize(s, d)
      .select(col("session_start").as("st"), col("session_end").as("en"))
    val deltas = sess.select(col("st").as("t"), lit(1L).as("dv"))
      .unionAll(sess.select((col("en") + 1L).as("t"), lit(-1L).as("dv")))
      .withColumn("b", expr("t div 604800"))
    val wIn = Window.partitionBy("b").orderBy(col("t"), col("dv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perB = deltas
      .withColumn("run", sum(col("dv")).over(wIn))
      .groupBy("b")
      .agg(
        sum(when(col("dv") === 1L, 1L).otherwise(0L)).cast(LongType).as("n_starts"),
        sum(when(col("dv") === -1L, 1L).otherwise(0L)).cast(LongType).as("n_ends"),
        max(col("run")).as("maxrun"),
        sum(col("dv")).as("net"))
    val wCarry = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    perB
      .withColumn("carry", coalesce(sum(col("net")).over(wCarry), lit(0L)))
      .select(col("b").as("bucket"), col("n_starts"), col("n_ends"),
        (col("carry") + col("maxrun")).cast(LongType).as("max_concurrent"))
      .orderBy("bucket")
  }

  /** q_out_of_order — the watermark audit: how disordered is the
    * event stream in ARRIVAL order (event_id, the producer sequence)
    * versus EVENT time? Per event_type: events seen, events that
    * arrived after a later-timestamped event already had (late), the
    * worst lateness in micros (= the watermark delay a streaming
    * consumer of this log would need to never drop a row), and the
    * late share in permille. This is the number that sizes every
    * `withWatermark` in the streaming layer — guessed watermarks
    * silently drop data; measured ones are a contract.
    *
    * Plan: the same two-level prefix decomposition as
    * [[qConcurrencyCurve]] — the corpus-sized "running max ts so far"
    * window partitions on (event_type, arrival block), the only
    * global-order pass runs over block summaries (a prefix max per
    * type over blocks), so no single partition ever holds a type's
    * full history. The DuckDB twin runs the NAIVE per-type global
    * running max — hash equality proves the decomposition exact. */
  val qOutOfOrder: Q = (s, d) => {
    val ev = Tables.events(s, d).select(
      col("event_type"), col("event_id"),
      expr("ts div 1000").cast(LongType).as("ts_us"),
      expr("event_id div 128").cast(LongType).as("blk"))
    val wIn = Window.partitionBy("event_type", "blk").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCarry = Window.partitionBy("event_type").orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkMax = ev.groupBy("event_type", "blk").agg(max("ts_us").as("bm"))
      .withColumn("carry", max(col("bm")).over(wCarry))
      .select("event_type", "blk", "carry")
    // greatest() skips nulls: null iff this is the type's first block
    // AND the first row inside it — i.e. the type's first arrival
    ev.withColumn("inmax", max(col("ts_us")).over(wIn))
      .join(blkMax, Seq("event_type", "blk"))
      .withColumn("prevmax", greatest(col("inmax"), col("carry")))
      .withColumn("late_us",
        when(col("prevmax").isNull || col("prevmax") <= col("ts_us"), 0L)
          .otherwise(col("prevmax") - col("ts_us")).cast(LongType))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).cast(LongType)
          .as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).cast(LongType).as("sum_late_us"))
      .withColumn("late_permille",
        expr("(n_late * 1000) div n_events").cast(LongType))
      .orderBy("event_type")
  }

  /** q_autocorr_lag — lag-1 autocorrelation of the hourly event-count
    * series per event_type, exact in micros. With hourly counts c_t
    * (t over the type's OBSERVED activity hours in order), n hours and
    * S = Σc, the estimator r₁ = Σ(c_t−c̄)(c_{t+1}−c̄) / Σ(c_t−c̄)²
    * n²-scales to integers: dev_t = n·c_t − S, r₁·10⁶ =
    * 10⁶·Σ dev_t·dev_{t+1} div Σ dev_t² — every term exact in
    * DECIMAL(38,0), no float drift between engines. High r₁ = smooth
    * load (cacheable, schedulable); r₁ near 0 = memoryless arrivals;
    * negative = oscillation (retry storms, batch-flush sawtooth).
    *
    * Plan: the corpus-sized work is one (type, hour) hash aggregate;
    * the window and final reduce run on the hours×types frame, which
    * is CALENDAR-bounded (8760 rows/type/year) at any corpus scale. */
  val qAutocorrLag: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val cnt = Tables.events(s, d)
      .select(col("event_type"), expr("(ts div 1000000000) div 3600").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).cast(dec).as("c"))
    val wT = Window.partitionBy("event_type")
    val wLead = Window.partitionBy("event_type").orderBy("hr")
    cnt
      .withColumn("n", count(lit(1)).over(wT).cast(dec))
      .withColumn("stot", sum(col("c")).over(wT))
      .withColumn("dev", col("n") * col("c") - col("stot"))
      .withColumn("devnext",
        col("n") * lead(col("c"), 1).over(wLead) - col("stot"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast(LongType).as("n_hours"),
        sum(col("c")).cast(LongType).as("n_events"),
        // sum skips the last hour's null devnext — exactly the n−1
        // consecutive pairs the estimator wants
        sum(col("dev") * col("devnext")).as("num"),
        sum(col("dev") * col("dev")).as("den"))
      .filter(col("den") =!= 0)
      .select(col("event_type"), col("n_hours"), col("n_events"),
        expr("(num * 1000000) div den").cast(LongType).as("acf1_micro"))
      .orderBy("event_type")
  }

  /** q_cusum_changepoint — CUSUM drift localization per event_type:
    * over the type's daily counts c_u (D observed days, S total
    * events), the running deviation sum s_t = Σ_{u≤t}(D·c_u − S) is
    * zero at both ends and bows maximally at the day the rate regime
    * shifts. Emits that argmax day (ties → earliest), its |s| as a
    * permille of the D·S ceiling, and the day count — the "WHEN did
    * ingest change" answer that a global mean can only average away.
    * Integer-exact: D-scaling removes the mean division, everything
    * rides DECIMAL(38,0) until the final permille div.
    *
    * Plan: corpus-sized work is one (type, day) hash aggregate; the
    * running sum and the argmax row_number run on the CALENDAR-bounded
    * days×types frame. */
  val qCusumChangepoint: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val cnt = Tables.events(s, d)
      .select(col("event_type"), expr("(ts div 1000000000) div 86400").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).cast(dec).as("c"))
    val wT = Window.partitionBy("event_type")
    val wRun = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = cnt
      .withColumn("dd", count(lit(1)).over(wT).cast(dec))
      .withColumn("stot", sum(col("c")).over(wT))
      .withColumn("s", sum(col("dd") * col("c") - col("stot")).over(wRun))
      .withColumn("abs_s", abs(col("s")))
    val wPick = Window.partitionBy("event_type")
      .orderBy(col("abs_s").desc, col("day"))
    curve
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("event_type"),
        col("dd").cast(LongType).as("n_days"),
        col("day").cast(LongType).as("cp_day"),
        expr("(abs_s * 1000) div (dd * stot)").cast(LongType)
          .as("cusum_permille"))
      .orderBy("event_type")
  }

  /** q_seasonality — the weekly load profile: events per (event_type,
    * day-of-week, hour-of-day) cell with each cell's share of its
    * type's volume in permille. Dow/hour come from pure epoch
    * arithmetic ((days+4) mod 7, 0 = Sunday — engine- and tz-neutral,
    * no calendar library in the hash path). The capacity-planning and
    * anomaly-baseline table: a crawler heartbeat that is flat across
    * this profile is a machine; user traffic breathes with it.
    *
    * Plan: one corpus-sized hash aggregate onto the ≤ types·168-cell
    * grid; the share window runs on that grid, result-sized at any
    * corpus scale. */
  val qSeasonality: Q = (s, d) => {
    val grid = Tables.events(s, d)
      .select(col("event_type"),
        expr("((ts div 1000000000) div 86400 + 4) % 7").cast(LongType).as("dow"),
        expr("((ts div 1000000000) % 86400) div 3600").cast(LongType).as("hr"))
      .groupBy("event_type", "dow", "hr")
      .agg(count(lit(1)).as("n_events"))
    grid
      .withColumn("share_permille",
        expr("(n_events * 1000) div (sum(n_events) OVER " +
          "(PARTITION BY event_type))").cast(LongType))
      .orderBy("event_type", "dow", "hr")
  }

  /** q_tail_latency — exact p50/p95/p99 of inter-event gaps per
    * event_type (the gap belongs to the LATER event's type): the
    * latency table of the heartbeat stream, where the p99 tail — not
    * the mean — is what pages someone. Nearest-rank picks (index =
    * 1 + ⌊(n−1)·q/100⌋) under the (gap, event_id) total order make
    * every percentile a deterministic observed value, never an
    * interpolated float. Exact by construction; the sketch-based
    * scale path is [[graft.functions.KllSketch]] (q_quantiles), and
    * this query is its exact ground truth — at 100 TB the per-type
    * sort window would ride the two-level rank decomposition
    * ([[Ranking]]), the same admissibility argument as
    * [[qConcurrencyCurve]].
    *
    * Plan: one user-keyed lag window (the log's natural key), then
    * one type-keyed rank window over the gap frame, one final
    * aggregate. */
  val qTailLatency: Q = (s, d) => {
    val wU = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gaps = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").cast(LongType).as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(wU))
      .filter(col("gap_us").isNotNull)
    val wT = Window.partitionBy("event_type").orderBy(col("gap_us"), col("event_id"))
    val ranked = gaps
      .withColumn("rn", row_number().over(wT).cast(LongType))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type"))
        .cast(LongType))
    def pick(q: Int) =
      min(when(col("rn") === lit(1L) + expr(s"((n - 1) * $q) div 100"),
        col("gap_us"))).cast(LongType)
    ranked.groupBy("event_type")
      .agg(max(col("n")).as("n_gaps"),
        pick(50).as("p50_us"), pick(95).as("p95_us"), pick(99).as("p99_us"))
      .orderBy("event_type")
  }

  /** q_cdc_apply — change-stream application (the MERGE INTO / SCD
    * "current snapshot" semantics): replaying each user's events in
    * (ts, event_id) order, the final state is the LAST operation's
    * verdict — an 'error' tombstones the account (alive=0), any other
    * op leaves it live; current_cents is the last NON-error op's
    * value (a tombstone doesn't erase the balance history). Emitted
    * per user: op count, last op + its micros, current_cents, alive.
    * No window, no sort: both "last" picks are deterministic
    * struct-maxes inside ONE hash aggregate — the upsert path of a
    * 100 TB CDC consumer is exactly this shape (shuffle keyed on the
    * entity id, map-side partial maxes), never a per-key ORDER BY.
    * The unique event_id tiebreak means the string field riding the
    * struct never decides the comparison. */
  val qCdcApply: Q = (s, d) => {
    val ev = Tables.events(s, d).select(
      col("user_id"), col("event_id"), col("event_type"),
      expr("ts div 1000").cast(LongType).as("ts_us"),
      intScaled(dec2(col("value")), 100L).as("v_cents"))
    ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_ops"),
        max(struct(col("ts_us"), col("event_id"), col("event_type")))
          .as("last"),
        max(when(col("event_type") =!= "error",
          struct(col("ts_us"), col("event_id"), col("v_cents")))).as("lastup"))
      .select(col("user_id"), col("n_ops"),
        col("last.event_type").as("last_op"),
        col("last.ts_us").as("last_ts_us"),
        coalesce(col("lastup.v_cents"), lit(0L)).cast(LongType)
          .as("current_cents"),
        when(col("last.event_type") === "error", 0L).otherwise(1L)
          .cast(LongType).as("alive"))
      .orderBy("user_id")
  }

  /** q_rolling_median — exact rolling LOWER median of event value over
    * each user's last 7 events, the robust-smoothing companion to
    * [[qEwmaTrailing]] (a median filter shrugs off the single-spike
    * outliers that drag any mean-based smoother). Spark has no medians
    * over ROWS frames, so the frame's values ride a bounded
    * collect_list → array_sort → element_at((n+1) div 2) — a ≤7-element
    * in-memory sort per row, not an aggregate rewrite. Lower median
    * (order statistic, not midpoint average) keeps everything integer.
    *
    * Scale shape: one shuffle on user_id (high-cardinality key — the
    * anti-skew choice vs the handful of event_types), then bounded
    * 7-row frames; no single-partition window, output linear in input. */
  val qRollingMedian: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(-6, Window.currentRow)
    Tables.eventsWithEpoch(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        intScaled(dec2(col("value")), 100L).as("v_cents"))
      .withColumn("vals", collect_list(col("v_cents")).over(w))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("v_cents"),
        element_at(array_sort(col("vals")),
          ((size(col("vals")) + 1) / 2).cast("int")).as("med7_cents"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** q_temporal_decay — recency-weighted event mixture: each event's
    * weight halves per week of age (measured back from the corpus'
    * own max timestamp — never NOW(), which would make the result a
    * function of when you ran it), and the per-type mass shares are
    * emitted next to the unweighted shares. The pipeline question this
    * answers: "if we recency-weight the crawl (fresh snapshots
    * upweighted, stale mirrors decayed), how does the training mix
    * actually shift?" — the weighted-vs-raw permille delta IS that
    * answer, per type. Exact integers: weight = 2^(−age_weeks) in
    * micros via a single shift (exponent clamped at 40 where the
    * weight is already 0), no float exponentials to disagree on.
    *
    * Plan: one scan against a broadcast 1-row max-timestamp scalar,
    * one |types|-group aggregate (map-side partials carry (count,
    * weight-sum) pairs), and the share windows run over the ≤ |types|
    * aggregate rows — bounded. Nothing about the shape changes at
    * 100 TB: the scalar is still one row and the rollup is still
    * type-count-sized. */
  val qTemporalDecay: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_type"), nanosToSec(col("ts")).as("sec"))
    val mx = ev.agg(max("sec").as("max_sec"))
    ev.crossJoin(broadcast(mx))
      .withColumn("w_micros",
        expr("""1000000 div shiftleft(CAST(1 AS BIGINT),
          CAST(LEAST(((max_sec - sec) div 86400) div 7, 40) AS INT))""")
          .cast(LongType))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("w_micros").cast(LongType).as("w_mass"))
      .withColumn("raw_permille",
        expr("(n * 1000) div (SUM(n) OVER ())").cast(LongType))
      .withColumn("decay_permille",
        expr("(w_mass * 1000) div (SUM(w_mass) OVER ())").cast(LongType))
      .select("event_type", "n", "w_mass", "raw_permille", "decay_permille")
      .orderBy("event_type")
  }

  /** q_attribution — first-touch vs last-touch conversion attribution
    * over the event stream: every `purchase` credits (a) the user's
    * FIRST event before it and (b) the event immediately preceding it,
    * rolled up per touch type with within-model share permille. The
    * two models bracket the attribution spectrum — when they disagree
    * hard (entry points earn first-touch, closers earn last-touch),
    * any single-touch number is lying, and this table is how you see
    * it. Purchases with no prior event credit nothing (nothing touched
    * them).
    *
    * Plan: ONE user-keyed window exchange serves both signals (lag-1
    * and the unbounded-preceding-to-−1 first_value share the
    * partitioning and ordering — Catalyst computes them in one
    * WindowExec), the conversions frame is checkpointed once to feed
    * both rollups, and the share windows run over ≤ |types| rows per
    * model. High-cardinality user partitioning; no funnel. */
  val qAttribution: Q = (s, d) => {
    val wOrd = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val conv = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        nanosToSec(col("ts")).as("sec"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(wOrd))
      .withColumn("first_et", first(col("event_type")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("event_type") === "purchase" && col("prev").isNotNull)
      .select("prev", "first_et")
      .localCheckpoint()
    val firstAgg = conv.groupBy(col("first_et").as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"))
      .select(lit("first_touch").as("model"), col("touch_type"),
        col("n_conversions"))
    val lastAgg = conv.groupBy(col("prev").as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"))
      .select(lit("last_touch").as("model"), col("touch_type"),
        col("n_conversions"))
    firstAgg.unionByName(lastAgg)
      .withColumn("share_permille",
        expr("(n_conversions * 1000)"
          + " div (SUM(n_conversions) OVER (PARTITION BY model))")
          .cast(LongType))
      .orderBy("model", "touch_type")
  }

  /** q_interarrival_fit — does each event type's arrival process look
    * Poisson? Per type: pooled per-user inter-arrival gaps, their
    * exact mean, and the Kolmogorov–Smirnov distance between the
    * empirical gap distribution and the exponential with that mean —
    * the model-fit readout behind every "is this traffic organic or a
    * bot burst" triage (bots arrive in lockstep: tiny KS against a
    * point mass, huge against the exponential). Complements
    * [[qKsDistance]] (two-sample) with the one-sample
    * model-vs-data form.
    *
    * Float contract: the model CDF 1 − e^(−g·n/Σg) is ONE pinned
    * double expression per distinct gap value, identical in both
    * engines, and the KS max floors to a 10⁻³ grid — the
    * [[graft.operators.TextStats]] log2 determinism argument, applied
    * to exp. Both CDF sides of each empirical jump are compared
    * (right limit cum/n and left limit (cum−c)/n), the textbook
    * one-sample D.
    *
    * Shape: gaps from a (type, user)-keyed lag (high-cardinality
    * partitions), then a VALUE HISTOGRAM per type — everything after
    * the scan is |distinct gaps|·|types| rows, and the cum window is
    * value-domain-sized. All-zero-gap or gap-free types emit
    * nothing (no exponential to fit; stated). */
  val qInterarrivalFit: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("sec"))
    val wLag = Window.partitionBy("event_type", "user_id")
      .orderBy("sec", "event_id")
    val hist = ev
      .withColumn("g", col("sec") - lag(col("sec"), 1).over(wLag))
      .filter(col("g").isNotNull)
      .groupBy("event_type", "g").agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds totals and the cum window
    val tot = hist.groupBy("event_type")
      .agg(sum("c").cast(LongType).as("n"),
        sum(expr("g * c")).cast(LongType).as("gsum"))
      .filter(col("n") >= 1 && col("gsum") > 0)
    val wCum = Window.partitionBy("event_type").orderBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ks = hist
      .withColumn("cumc", sum("c").over(wCum))
      .join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"),
        greatest(
          abs(col("cumc").cast(DoubleType) / col("n") -
            (lit(1.0) - exp(-col("g").cast(DoubleType) * col("n")
              / col("gsum")))),
          abs((col("cumc") - col("c")).cast(DoubleType) / col("n") -
            (lit(1.0) - exp(-col("g").cast(DoubleType) * col("n")
              / col("gsum"))))).as("t"))
      .groupBy("event_type").agg(max("t").as("d"))
    tot.join(ks, Seq("event_type"))
      .select(col("event_type"), col("n").as("n_gaps"),
        expr("(gsum * 1000) div n").cast(LongType).as("mean_gap_milli"),
        floor(lit(1000.0) * col("d")).cast(LongType).as("ks_milli"))
      .orderBy("event_type")
  }

  /** q_theil_sen — robust trend per event type: the Theil–Sen
    * estimator (median of all pairwise slopes) over daily revenue,
    * the breakdown-resistant companion to [[Evaluation.qOlsTrend]]'s
    * least squares — one flash-sale day drags an OLS slope arbitrarily
    * far but moves the pairwise-slope median by one rank. Emits the
    * lower-median slope in micro-cents/day (median rank (m+1)/2,
    * pinned — no even-m averaging, so the result is always an actual
    * pairwise slope).
    *
    * Exact: slope_micro = ⌊Δcents·10⁶ / Δday⌋ via the additive-shift
    * floor division (shift 10¹⁸ covers |slope| ≤ 10¹² cents/day —
    * Δcents·10⁶ + Δday·10¹⁸ stays positive and inside DECIMAL(38,0)
    * for any day span < 10¹⁵), so Spark's truncating div and DuckDB's
    * flooring // agree on negative slopes. Shape: the pair join is
    * DAY-domain-sized (days², time-bounded, never event-count-sized);
    * the median window partitions per type over those pairs. */
  val qTheilSen: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        expr("(ts div 1000000000) div 86400").as("day"),
        intScaled(dec2(col("value")), 100L).as("cents"))
      .groupBy("event_type", "day")
      .agg(sum("cents").cast(LongType).as("cents"))
      .localCheckpoint() // both sides of the pair join
    val slopes = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        expr("""((cast(b.cents - a.cents as decimal(38,0)) * 1000000
               + cast(b.day - a.day as decimal(38,0)) * 1000000000000000000)
               div (b.day - a.day)) - 1000000000000000000""").as("sm"))
    val wRank = Window.partitionBy("event_type").orderBy("sm")
    val wCnt = Window.partitionBy("event_type")
    val nDays = daily.groupBy("event_type")
      .agg(count(lit(1)).cast(LongType).as("n_days"))
    slopes
      .withColumn("rn", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wCnt))
      .filter(col("rn") === expr("(m + 1) div 2"))
      .join(broadcast(nDays), Seq("event_type"))
      .select(col("event_type"), col("n_days"),
        col("m").cast(LongType).as("n_pairs"),
        col("sm").cast(LongType).as("ts_slope_micro_cents"))
      .orderBy("event_type")
  }

  /** q_rfm_segments — RFM customer segmentation over the event log:
    * per user, Recency (last-activity day), Frequency (event count),
    * Monetary (total cents), each scored into ascending quartiles
    * 1..4 (ties break on user_id — pinned), concatenated into the
    * classic 3-digit segment code (444 = recent+frequent+big-spend,
    * 111 = churned small fry), rolled up to segment populations and
    * revenue. The standard marketing-analytics cut — and the same
    * quartile machinery a data pipeline uses to stratify users for
    * sampling.
    *
    * Scale shape: each quartile is [[Ranking.globalRowNumber]] (the
    * range-bucketed distributed rank — NO single-task global window;
    * the oracle runs the plain ntile) + [[Ranking.ntileFromRn]]'s
    * pure-integer bucket arithmetic; three ranks over the
    * |users|-sized rollup, then a ≤64-group final aggregate. */
  val qRfmSegments: Q = (s, d) => {
    val users = Tables.events(s, d)
      .select(col("user_id"),
        expr("(ts div 1000000000) div 86400").as("day"),
        intScaled(dec2(col("value")), 100L).as("cents"))
      .groupBy("user_id")
      .agg(max("day").as("r_day"),
        count(lit(1)).as("f_cnt"),
        sum("cents").cast(LongType).as("m_cents"))
      .localCheckpoint() // three rank passes + the rollup read it
    val n = users.count()
    // each quartile pass ends in a localCheckpoint: chained directly,
    // every globalRowNumber re-executed its predecessors' range
    // exchange + offset join for its OWN range-boundary sample job and
    // offsets broadcast — measured ~20 executor-CPU-s for a |users|-
    // sized frame (isolated, r16); with the lineage cut per pass it is
    // one execution each (guide §3.3 "materialise to truncate plans")
    def quartile(metric: String, out: String)(df: DataFrame): DataFrame =
      Ranking.globalRowNumber(df, Seq(col(metric), col("user_id")), "__rn")
        .withColumn(out, Ranking.ntileFromRn(col("__rn"), lit(n), 4))
        .drop("__rn")
        .localCheckpoint()
    val scored = quartile("m_cents", "m_q")(
      quartile("f_cnt", "f_q")(quartile("r_day", "r_q")(users)))
    scored
      .withColumn("rfm_code",
        (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).cast(LongType))
      .groupBy("rfm_code")
      .agg(count(lit(1)).cast(LongType).as("n_users"),
        sum("m_cents").cast(LongType).as("total_cents"))
      .orderBy("rfm_code")
  }

  /** One CUSUM argmax pass over (parts…, day, c): per part group, the
    * day where the running deviation sum bows furthest (ties →
    * earliest), with the group's day count and the |s| ceiling share.
    * The [[qCusumChangepoint]] kernel, parameterized over the
    * partition so [[qChangepointSegments]] can re-run it inside each
    * half of a split. */
  private def cusumPick(cnt: DataFrame, parts: Seq[String]): DataFrame = {
    val pc = parts.map(col)
    val wT = Window.partitionBy(pc: _*)
    val wRun = Window.partitionBy(pc: _*).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPick = Window.partitionBy(pc: _*)
      .orderBy(col("abs_s").desc, col("day"))
    cnt
      .withColumn("dd", count(lit(1)).over(wT).cast(DecimalType(38, 0)))
      .withColumn("stot", sum(col("c")).over(wT))
      .withColumn("s", sum(col("dd") * col("c") - col("stot")).over(wRun))
      .withColumn("abs_s", abs(col("s")))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(pc :+ col("dd").cast(LongType).as("n_days") :+
        col("day").cast(LongType).as("cp_day") :+
        expr("(abs_s * 1000) div (dd * stot)").cast(LongType)
          .as("cusum_permille"): _*)
  }

  /** q_changepoint_segments — two-level binary segmentation of each
    * event type's daily rate (Scott & Knott's recursion, depth 2):
    * the level-1 CUSUM changepoint splits the day range, then the
    * SAME kernel re-runs independently inside each half — up to three
    * changepoints locating up to four rate regimes, where
    * [[qCusumChangepoint]] stops at one. Level-2 deviation shares are
    * scaled by their OWN half's ceiling (stated — each recursion level
    * answers "where does THIS segment break", not "how big globally").
    * Halves with a single day emit nothing (no interior split exists).
    *
    * Plan: the kernel is windows over the ≤|types|·|days| daily
    * rollup; level 2 re-partitions the SAME rollup by (type, half) —
    * two result-sized passes, nothing corpus-sized after the one
    * scan. */
  val qChangepointSegments: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val cnt = Tables.events(s, d)
      .select(col("event_type"),
        expr("(ts div 1000000000) div 86400").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).cast(dec).as("c"))
      .localCheckpoint() // level 1 and the half melt both read it
    val l1 = cusumPick(cnt, Seq("event_type"))
    val halves = cnt.join(
        broadcast(l1.select(col("event_type"), col("cp_day"))), "event_type")
      .withColumn("half",
        when(col("day") <= col("cp_day"), 0L).otherwise(1L))
      .select("event_type", "half", "day", "c")
    val l2 = cusumPick(halves, Seq("event_type", "half"))
      .filter(col("n_days") >= 2)
    l1.select(col("event_type"), lit(1L).as("level"), lit(0L).as("segment"),
        col("n_days"), col("cp_day"), col("cusum_permille"))
      .unionByName(l2.select(col("event_type"), lit(2L).as("level"),
        col("half").as("segment"), col("n_days"), col("cp_day"),
        col("cusum_permille")))
      .orderBy("event_type", "level", "segment")
  }

  /** q_eventually_follows — the process-mining eventually-follows
    * matrix (van der Aalst, "Process Mining", ch. 6): for each ordered
    * type pair (a, b), how many users have SOME a-event strictly
    * before SOME b-event — the transitive companion of
    * [[qEventTransitions]]' directly-follows counts, and the relation
    * conformance checking starts from (a `report_done` that is ever
    * eventually followed by `crawl_start` in the same case is a
    * process violation the adjacent-pair matrix cannot see).
    *
    * Exists-before reduces to endpoints: user u has a→b iff
    * min-key(a-events) < max-key(b-events) in the total (ts_sec,
    * event_id) order — no pair enumeration, no quadratic blowup.
    * a = b rows read "user has ≥ 2 events of the type".
    *
    * Plan: one (user, type) aggregate off the scan (min/max structs),
    * then a user-keyed self-join of ≤ |types| rows per user (bounded
    * fan-out |types|² per user), a |types|²-cell rollup, and a
    * broadcast one-row total. At 100 TB the only corpus-sized exchange
    * is the first aggregate's shuffle on (user, type). */
  val qEventuallyFollows: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        nanosToSec(col("ts")).as("ts_sec"), col("event_id"))
    val ext = ev.groupBy("user_id", "event_type")
      .agg(min(struct(col("ts_sec"), col("event_id"))).as("fk"),
        max(struct(col("ts_sec"), col("event_id"))).as("lk"))
      .select(col("user_id"), col("event_type"),
        col("fk.ts_sec").as("f_ts"), col("fk.event_id").as("f_id"),
        col("lk.ts_sec").as("l_ts"), col("lk.event_id").as("l_id"))
    val tot = ev.agg(countDistinct(col("user_id")).as("n_total"))
    val a = ext.select(col("user_id"), col("event_type").as("type_a"),
      col("f_ts"), col("f_id"))
    val b = ext.select(col("user_id"), col("event_type").as("type_b"),
      col("l_ts"), col("l_id"))
    a.join(b, Seq("user_id"))
      .filter(col("f_ts") < col("l_ts") ||
        (col("f_ts") === col("l_ts") && col("f_id") < col("l_id")))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).cast(LongType).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("type_a"), col("type_b"), col("n_users"),
        expr("(n_users * 1000) div n_total").cast(LongType)
          .as("support_permille"))
      .orderBy("type_a", "type_b")
  }

  /** q_littles_law — the queueing-theory audit L = λW over the 7-day
    * session spine ([[graft.operators.Reports]]' `q_sessionize` gap
    * rule): per 7-day week, sessions STARTED (λ·T), their total
    * duration (λ·T·W), and the exact time-average of concurrently-open
    * sessions L from interval overlap. In steady state the two sides
    * agree; weeks where they diverge are ramp-up/ramp-down or
    * censoring at the data boundary — exactly what a capacity planner
    * reads the residual for. All integer: λW per week-unit collapses
    * to duration-sum/T, so both sides are milli-scaled exact ratios
    * and the residual is their difference (shift-free: overlap and
    * duration sums are non-negative; the residual subtracts AFTER the
    * two floors).
    *
    * Session presence is the half-open [start, end): a single-event
    * session has zero measure in L and zero duration in W — the two
    * sides stay consistent by construction.
    *
    * Plan: the session rollup is one user-keyed window + aggregate
    * (the sessionize shape); the overlap leg explodes each session to
    * its covered weeks (the [[qIntervalOverlap]] bucket-join shape —
    * rows = Σ weeks-per-session, user-week bounded, never events ×
    * weeks); both rollups are week-keyed. */
  val qLittlesLaw: Q = (s, d) => {
    val gap = 604800L
    val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    val sessions = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), nanosToSec(col("ts")).as("ts_sec"))
      .withColumn("prev_ts", lag(col("ts_sec"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_sec") - col("prev_ts") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(w))
      .groupBy("user_id", "session_idx")
      .agg(min(col("ts_sec")).as("t0"), max(col("ts_sec")).as("t1"))
      .localCheckpoint() // two consumers: started-rollup + overlap melt
    val started = sessions
      .withColumn("week", expr("t0 div 604800"))
      .groupBy("week")
      .agg(count(lit(1)).cast(LongType).as("n_started"),
        sum(col("t1") - col("t0")).cast(LongType).as("dur_sec"))
    val overlap = sessions
      .select(col("t0"), col("t1"),
        explode(sequence(expr("t0 div 604800"), expr("t1 div 604800")))
          .as("week"))
      .select(col("week"),
        (least(col("t1"), (col("week") + 1) * gap)
          - greatest(col("t0"), col("week") * gap)).as("ov_sec"))
      .groupBy("week").agg(sum(col("ov_sec")).cast(LongType).as("ov_sec"))
    started.join(overlap, Seq("week"), "full")
      .na.fill(0L, Seq("n_started", "dur_sec", "ov_sec"))
      .select(col("week").cast(LongType).as("week"),
        col("n_started"), col("dur_sec"),
        expr("(ov_sec * 1000) div 604800").cast(LongType).as("l_milli"),
        expr("(dur_sec * 1000) div 604800").cast(LongType).as("lw_milli"))
      .withColumn("resid_milli",
        (col("l_milli") - col("lw_milli")).cast(LongType))
      .orderBy("week")
  }

  /** q_hourly_anomaly — seasonally-adjusted volume anomalies: each
    * hourly event count is judged against its OWN (weekday, hour)
    * profile cell (the [[qSeasonality]] grid), so a busy Monday 9am is
    * normal while the same count at Sunday 3am flags. The score is the
    * exact z² against the cell's mean/variance, kept integral by
    * clearing denominators: z² = (n·c − s)² / (n·Σc² − s²) with n the
    * cell's bucket count, s its count sum — no square root, no float,
    * HUGEINT/DECIMAL(38,0) interiors (counts square to n²·c² scale).
    * Top 20 by z² (ties by bucket) rather than a fixed fence, so the
    * report is non-empty on any corpus and ranks what an on-call
    * engineer would look at first. Cells need ≥ 4 buckets and positive
    * variance (a constant cell has no scale to judge against).
    *
    * Plan: one scan → hourly rollup (time-keyed, balanced), a
    * 168-cell profile aggregate joined back broadcast, and a
    * result-sized top-k sort. */
  val qHourlyAnomaly: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    val hourly = Tables.events(s, d)
      .select(expr("(ts div 1000000000) div 3600").as("hb"))
      .groupBy("hb").agg(count(lit(1)).cast(dec).as("c"))
      .withColumn("dow", expr("((hb div 24) + 4) % 7"))
      .withColumn("hod", expr("hb % 24"))
    val prof = hourly.groupBy("dow", "hod")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("s2"))
    hourly.join(broadcast(prof), Seq("dow", "hod"))
      .filter(col("n") >= 4 &&
        col("n") * col("s2") - col("s") * col("s") > 0)
      .withColumn("z2_milli",
        expr("""((n * c - s) * (n * c - s) * 1000)
               | div (n * s2 - s * s)""".stripMargin).cast(LongType))
      .select(col("hb").cast(LongType).as("hour_bucket"),
        col("dow").cast(LongType).as("dow"),
        col("hod").cast(LongType).as("hour_of_day"),
        col("c").cast(LongType).as("n_events"),
        col("n").cast(LongType).as("cell_buckets"),
        col("z2_milli"))
      .orderBy(col("z2_milli").desc, col("hour_bucket"))
      .limit(20)
  }

  /** q_kaplan_meier — the Kaplan-Meier survival estimator (Kaplan &
    * Meier 1958) over session durations with right-censoring at the
    * observation boundary: a session whose last event is within one
    * gap of the data's end may still be open, so treating it as
    * "ended" would bias every duration statistic short — the exact
    * error KM exists to remove, and the difference between this and
    * a naive duration histogram IS the censoring mass. Per death
    * time: the at-risk count, deaths, and the cumulative survival in
    * floored micro-log₂ units (log-space keeps the product a SUM, so
    * the per-term floor-before-sum contract applies verbatim; a
    * final all-die row floors to the −10⁹ sentinel rather than −∞,
    * stated). Censored-at-t sessions count at risk AT t (the standard
    * convention).
    *
    * Sessions use a 1-DAY gap (activity bursts): under the X19 7-day
    * spine this corpus collapses to one session per user, all
    * censored — a survival curve needs completed spells to estimate.
    *
    * Plan: the X19 session rollup shape (one user-keyed window), a
    * one-row broadcast of the observation end, then everything runs on
    * the DISTINCT-DURATION frame — value-domain-sized like the
    * [[qChangepointSegments]] daily rollup, so the bare ORDER BY dur
    * windows are bounded by the time domain, not the corpus. */
  val qKaplanMeier: Q = (s, d) => {
    val gap = 86400L // 1-day bursts: the 7-day spine censors everything
    val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), nanosToSec(col("ts")).as("ts_sec"))
    val sessions = ev
      .withColumn("prev_ts", lag(col("ts_sec"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_sec") - col("prev_ts") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(w))
      .groupBy("user_id", "session_idx")
      .agg(min(col("ts_sec")).as("t0"), max(col("ts_sec")).as("t1"))
    val tmax = ev.agg(max(col("ts_sec")).as("tmax"))
    val durs = sessions.crossJoin(broadcast(tmax))
      .select((col("t1") - col("t0")).as("dur"),
        when(col("tmax") - col("t1") <= gap, 0L).otherwise(1L).as("death"))
    val byDur = durs.groupBy("dur")
      .agg(count(lit(1)).as("cnt"), sum(col("death")).as("d"))
    val nTot = durs.agg(count(lit(1)).as("n"))
    // distinct-duration frame: bare ORDER BY windows bounded by the
    // value domain (≤ |distinct durations| rows), not the corpus
    val wD = Window.orderBy("dur")
    byDur
      .withColumn("n_before", coalesce(sum(col("cnt")).over(
        wD.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(nTot))
      .withColumn("n_risk", (col("n") - col("n_before")).cast(LongType))
      .filter(col("d") >= 1)
      .withColumn("term",
        when(col("n_risk") > col("d"),
          floor(lit(1000000.0) * log2(
            (col("n_risk") - col("d")).cast(DoubleType) / col("n_risk"))))
          .otherwise(lit(-1000000000L)).cast(LongType))
      .withColumn("log2_surv_micro",
        sum(col("term")).over(wD.rowsBetween(Window.unboundedPreceding, 0))
          .cast(LongType))
      .select(col("dur").cast(LongType).as("dur_sec"),
        col("n_risk"), col("d").cast(LongType).as("n_events"),
        col("log2_surv_micro"))
      .orderBy("dur_sec")
  }

  val queries: Map[String, Q] = Map(
    "q_kaplan_meier" -> qKaplanMeier,
    "q_eventually_follows" -> qEventuallyFollows,
    "q_littles_law" -> qLittlesLaw,
    "q_hourly_anomaly" -> qHourlyAnomaly,
    "q_changepoint_segments" -> qChangepointSegments,
    "q_rfm_segments" -> qRfmSegments,
    "q_interarrival_fit" -> qInterarrivalFit,
    "q_theil_sen" -> qTheilSen,
    "q_attribution" -> qAttribution,
    "q_temporal_decay" -> qTemporalDecay,
    "q_rolling_median" -> qRollingMedian,
    "q_cdc_apply" -> qCdcApply,
    "q_tail_latency" -> qTailLatency,
    "q_seasonality" -> qSeasonality,
    "q_out_of_order" -> qOutOfOrder,
    "q_autocorr_lag" -> qAutocorrLag,
    "q_cusum_changepoint" -> qCusumChangepoint,
    "q_concurrency_curve" -> qConcurrencyCurve,
    "q_event_transitions" -> qEventTransitions,
    "q_conversion_rate" -> qConversionRate,
    "q_ab_test" -> qAbTest,
    "q_bootstrap_ci" -> qBootstrapCi,
    "q_funnel_time" -> qFunnelTime,
    "q_interval_overlap" -> qIntervalOverlap,
    "q_window_distinct" -> qWindowDistinct,
    "q_ewma_trailing" -> qEwmaTrailing,
    "q_burst_users" -> qBurstUsers)

  val oracle: Map[String, String] = Map(
    "q_kaplan_meier" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch_ms(ts) // 1000 AS BIGINT) AS ts_sec
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, event_id, ts_sec,
        |    LAG(ts_sec) OVER (PARTITION BY user_id
        |      ORDER BY ts_sec, event_id) AS prev_ts
        |  FROM ev),
        |idx AS (
        |  SELECT user_id, ts_sec,
        |    SUM(CASE WHEN prev_ts IS NULL OR ts_sec - prev_ts > 86400
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY ts_sec, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM lagged),
        |sess AS (
        |  SELECT user_id, sid, MIN(ts_sec) AS t0, MAX(ts_sec) AS t1
        |  FROM idx GROUP BY 1, 2),
        |tm AS (SELECT MAX(ts_sec) AS tmax FROM ev),
        |durs AS (
        |  SELECT t1 - t0 AS dur,
        |    CASE WHEN (SELECT tmax FROM tm) - t1 <= 86400
        |      THEN 0 ELSE 1 END AS death
        |  FROM sess),
        |bydur AS (
        |  SELECT dur, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(death) AS BIGINT) AS d
        |  FROM durs GROUP BY dur),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM durs),
        |risk AS (
        |  SELECT dur, d,
        |    (SELECT n FROM nt) - COALESCE(SUM(cnt) OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM bydur),
        |terms AS (
        |  SELECT dur, n_risk, d,
        |    CASE WHEN n_risk > d
        |      THEN CAST(floor(1000000.0 * log2(
        |        CAST(n_risk - d AS DOUBLE) / n_risk)) AS BIGINT)
        |      ELSE -1000000000 END AS term
        |  FROM risk WHERE d >= 1)
        |SELECT CAST(dur AS BIGINT) AS dur_sec,
        |  CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
        |  CAST(SUM(term) OVER (ORDER BY dur
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS log2_surv_micro
        |FROM terms ORDER BY dur_sec""".stripMargin,
    "q_eventually_follows" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    CAST(epoch_ms(ts) // 1000 AS BIGINT) AS ts_sec, event_id
        |  FROM events),
        |ranked AS (
        |  SELECT user_id, event_type, ts_sec, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts_sec, event_id) AS rf,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts_sec DESC, event_id DESC) AS rl
        |  FROM ev),
        |ext AS (
        |  SELECT user_id, event_type,
        |    MAX(CASE WHEN rf = 1 THEN ts_sec END) AS f_ts,
        |    MAX(CASE WHEN rf = 1 THEN event_id END) AS f_id,
        |    MAX(CASE WHEN rl = 1 THEN ts_sec END) AS l_ts,
        |    MAX(CASE WHEN rl = 1 THEN event_id END) AS l_id
        |  FROM ranked GROUP BY 1, 2),
        |tot AS (SELECT COUNT(DISTINCT user_id) AS n_total FROM ev),
        |hits AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b
        |  FROM ext a JOIN ext b USING (user_id)
        |  WHERE a.f_ts < b.l_ts OR (a.f_ts = b.l_ts AND a.f_id < b.l_id))
        |SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST((COUNT(*) * 1000) // (SELECT n_total FROM tot) AS BIGINT)
        |    AS support_permille
        |FROM hits GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_littles_law" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch_ms(ts) // 1000 AS BIGINT) AS ts_sec
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, event_id, ts_sec,
        |    LAG(ts_sec) OVER (PARTITION BY user_id
        |      ORDER BY ts_sec, event_id) AS prev_ts
        |  FROM ev),
        |flagged AS (
        |  SELECT user_id, event_id, ts_sec,
        |    CASE WHEN prev_ts IS NULL OR ts_sec - prev_ts > 604800
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM lagged),
        |idx AS (
        |  SELECT user_id, ts_sec,
        |    SUM(is_new) OVER (PARTITION BY user_id
        |      ORDER BY ts_sec, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged),
        |sess AS (
        |  SELECT user_id, sid, MIN(ts_sec) AS t0, MAX(ts_sec) AS t1
        |  FROM idx GROUP BY 1, 2),
        |started AS (
        |  SELECT t0 // 604800 AS week,
        |    CAST(COUNT(*) AS BIGINT) AS n_started,
        |    CAST(SUM(t1 - t0) AS BIGINT) AS dur_sec
        |  FROM sess GROUP BY 1),
        |melt AS (
        |  SELECT unnest(generate_series(t0 // 604800, t1 // 604800)) AS week,
        |    t0, t1
        |  FROM sess),
        |ov AS (
        |  SELECT week,
        |    CAST(SUM(LEAST(t1, (week + 1) * 604800)
        |      - GREATEST(t0, week * 604800)) AS BIGINT) AS ov_sec
        |  FROM melt GROUP BY 1)
        |SELECT CAST(week AS BIGINT) AS week,
        |  COALESCE(n_started, 0) AS n_started,
        |  COALESCE(dur_sec, 0) AS dur_sec,
        |  CAST((COALESCE(ov_sec, 0) * 1000) // 604800 AS BIGINT) AS l_milli,
        |  CAST((COALESCE(dur_sec, 0) * 1000) // 604800 AS BIGINT) AS lw_milli,
        |  CAST((COALESCE(ov_sec, 0) * 1000) // 604800
        |    - (COALESCE(dur_sec, 0) * 1000) // 604800 AS BIGINT) AS resid_milli
        |FROM started FULL JOIN ov USING (week)
        |ORDER BY week""".stripMargin,
    "q_hourly_anomaly" ->
      """WITH hourly AS (
        |  SELECT CAST(epoch_ms(ts) // 1000 // 3600 AS BIGINT) AS hb,
        |    CAST(COUNT(*) AS HUGEINT) AS c
        |  FROM events GROUP BY 1),
        |cells AS (
        |  SELECT hb, c, ((hb // 24) + 4) % 7 AS dow, hb % 24 AS hod
        |  FROM hourly),
        |prof AS (
        |  SELECT dow, hod, CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(c) AS s, SUM(c * c) AS s2
        |  FROM cells GROUP BY 1, 2)
        |SELECT CAST(hb AS BIGINT) AS hour_bucket,
        |  CAST(dow AS BIGINT) AS dow,
        |  CAST(hod AS BIGINT) AS hour_of_day,
        |  CAST(c AS BIGINT) AS n_events,
        |  CAST(n AS BIGINT) AS cell_buckets,
        |  CAST(((n * c - s) * (n * c - s) * 1000) // (n * s2 - s * s)
        |    AS BIGINT) AS z2_milli
        |FROM cells JOIN prof USING (dow, hod)
        |WHERE n >= 4 AND n * s2 - s * s > 0
        |ORDER BY z2_milli DESC, hour_bucket LIMIT 20""".stripMargin,
    "q_changepoint_segments" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(epoch_ms(ts) // 1000 // 86400 AS BIGINT) AS day,
        |    CAST(COUNT(*) AS HUGEINT) AS c
        |  FROM events GROUP BY 1, 2),
        |d1 AS (
        |  SELECT event_type, day, c,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT) AS dd,
        |    SUM(c) OVER (PARTITION BY event_type) AS stot
        |  FROM daily),
        |c1 AS (
        |  SELECT event_type, day, dd, stot,
        |    SUM(dd * c - stot) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS s
        |  FROM d1),
        |p1 AS (
        |  SELECT event_type, CAST(dd AS BIGINT) AS n_days,
        |    CAST(day AS BIGINT) AS cp_day,
        |    CAST((abs(s) * 1000) // (dd * stot) AS BIGINT) AS cusum_permille
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |          ORDER BY abs(s) DESC, day) AS rk FROM c1)
        |  WHERE rk = 1),
        |halves AS (
        |  SELECT d.event_type,
        |    CASE WHEN d.day <= p1.cp_day THEN 0 ELSE 1 END AS half,
        |    d.day, d.c
        |  FROM daily d JOIN p1 USING (event_type)),
        |d2 AS (
        |  SELECT event_type, half, day, c,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type, half) AS HUGEINT)
        |      AS dd,
        |    SUM(c) OVER (PARTITION BY event_type, half) AS stot
        |  FROM halves),
        |c2 AS (
        |  SELECT event_type, half, day, dd, stot,
        |    SUM(dd * c - stot) OVER (PARTITION BY event_type, half
        |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS s
        |  FROM d2),
        |p2 AS (
        |  SELECT event_type, CAST(half AS BIGINT) AS segment,
        |    CAST(dd AS BIGINT) AS n_days, CAST(day AS BIGINT) AS cp_day,
        |    CAST((abs(s) * 1000) // (dd * stot) AS BIGINT) AS cusum_permille
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, half
        |          ORDER BY abs(s) DESC, day) AS rk FROM c2)
        |  WHERE rk = 1 AND dd >= 2)
        |SELECT event_type, CAST(1 AS BIGINT) AS level,
        |  CAST(0 AS BIGINT) AS segment, n_days, cp_day, cusum_permille
        |FROM p1
        |UNION ALL
        |SELECT event_type, CAST(2 AS BIGINT), segment, n_days, cp_day,
        |  cusum_permille
        |FROM p2
        |ORDER BY event_type, level, segment""".stripMargin,
    "q_rfm_segments" ->
      """WITH users AS (
        |  SELECT user_id,
        |    MAX(CAST(epoch_ms(ts) // 1000 // 86400 AS BIGINT)) AS r_day,
        |    CAST(COUNT(*) AS BIGINT) AS f_cnt,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS m_cents
        |  FROM events GROUP BY user_id),
        |scored AS (
        |  SELECT user_id, m_cents,
        |    ntile(4) OVER (ORDER BY r_day, user_id) AS r_q,
        |    ntile(4) OVER (ORDER BY f_cnt, user_id) AS f_q,
        |    ntile(4) OVER (ORDER BY m_cents, user_id) AS m_q
        |  FROM users)
        |SELECT CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm_code,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(m_cents) AS BIGINT) AS total_cents
        |FROM scored GROUP BY 1 ORDER BY rfm_code""".stripMargin,
    "q_interarrival_fit" ->
      """WITH ev AS (
        |  SELECT event_type, user_id, event_id,
        |    CAST(epoch_ms(ts) // 1000 AS BIGINT) AS sec
        |  FROM events),
        |hist AS (
        |  SELECT event_type, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT event_type,
        |      sec - LAG(sec) OVER (PARTITION BY event_type, user_id
        |        ORDER BY sec, event_id) AS g
        |    FROM ev)
        |  WHERE g IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(g * c) AS BIGINT) AS gsum
        |  FROM hist GROUP BY 1
        |  HAVING SUM(c) >= 1 AND SUM(g * c) > 0),
        |cum AS (
        |  SELECT h.event_type, h.g, h.c, t.n, t.gsum,
        |    SUM(h.c) OVER (PARTITION BY h.event_type ORDER BY h.g) AS cumc
        |  FROM hist h JOIN tot t USING (event_type)),
        |ks AS (
        |  SELECT event_type, MAX(GREATEST(
        |      abs(CAST(cumc AS DOUBLE) / n
        |        - (1.0 - exp(-(CAST(g AS DOUBLE)) * n / gsum))),
        |      abs(CAST(cumc - c AS DOUBLE) / n
        |        - (1.0 - exp(-(CAST(g AS DOUBLE)) * n / gsum))))) AS d
        |  FROM cum GROUP BY 1)
        |SELECT t.event_type, t.n AS n_gaps,
        |  CAST((t.gsum * 1000) // t.n AS BIGINT) AS mean_gap_milli,
        |  CAST(floor(1000.0 * k.d) AS BIGINT) AS ks_milli
        |FROM tot t JOIN ks k USING (event_type)
        |ORDER BY t.event_type""".stripMargin,
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(epoch_ms(ts) // 1000 // 86400 AS BIGINT) AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |slopes AS (
        |  SELECT a.event_type,
        |    ((CAST(b.cents - a.cents AS HUGEINT) * 1000000
        |      + CAST(b.day - a.day AS HUGEINT) * 1000000000000000000)
        |     // (b.day - a.day)) - 1000000000000000000 AS sm
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |ranked AS (
        |  SELECT event_type, sm,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY sm) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS m
        |  FROM slopes),
        |nd AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1)
        |SELECT r.event_type, nd.n_days, CAST(r.m AS BIGINT) AS n_pairs,
        |  CAST(r.sm AS BIGINT) AS ts_slope_micro_cents
        |FROM ranked r JOIN nd USING (event_type)
        |WHERE r.rn = (r.m + 1) // 2
        |ORDER BY r.event_type""".stripMargin,
    "q_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
        |    event_type
        |  FROM events),
        |seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id) AS prev,
        |    first_value(event_type) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_et
        |  FROM ev),
        |conv AS (
        |  SELECT prev, first_et FROM seq
        |  WHERE event_type = 'purchase' AND prev IS NOT NULL),
        |tbl AS (
        |  SELECT 'first_touch' AS model, first_et AS touch_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_conversions
        |  FROM conv GROUP BY 2
        |  UNION ALL
        |  SELECT 'last_touch', prev, CAST(COUNT(*) AS BIGINT)
        |  FROM conv GROUP BY 2)
        |SELECT model, touch_type, n_conversions,
        |  CAST((n_conversions * 1000)
        |    // (SUM(n_conversions) OVER (PARTITION BY model)) AS BIGINT)
        |    AS share_permille
        |FROM tbl ORDER BY model, touch_type""".stripMargin,
    "q_temporal_decay" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 AS sec FROM events),
        |mx AS (SELECT MAX(sec) AS max_sec FROM ev),
        |w AS (
        |  SELECT event_type,
        |    1000000 // (CAST(1 AS BIGINT)
        |      << LEAST(((max_sec - sec) // 86400) // 7, 40)) AS w_micros
        |  FROM ev CROSS JOIN mx),
        |agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(w_micros) AS BIGINT) AS w_mass
        |  FROM w GROUP BY 1)
        |SELECT event_type, n, w_mass,
        |  CAST((n * 1000) // (SUM(n) OVER ()) AS BIGINT) AS raw_permille,
        |  CAST((w_mass * 1000) // (SUM(w_mass) OVER ()) AS BIGINT)
        |    AS decay_permille
        |FROM agg ORDER BY event_type""".stripMargin,
    "q_rolling_median" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
        |  FROM events),
        |fr AS (
        |  SELECT user_id, event_id, ts_us, v_cents,
        |    list(v_cents) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS vals
        |  FROM ev)
        |SELECT user_id, event_id, ts_us, v_cents,
        |  list_sort(vals)[(len(vals) + 1) // 2] AS med7_cents
        |FROM fr ORDER BY user_id, ts_us, event_id""".stripMargin,
    "q_cdc_apply" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
        |  FROM events),
        |agg AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ops,
        |    MAX(struct_pack(ts_us := ts_us, event_id := event_id,
        |                    event_type := event_type)) AS last,
        |    MAX(CASE WHEN event_type != 'error'
        |        THEN struct_pack(ts_us := ts_us, event_id := event_id,
        |                         v_cents := v_cents) END) AS lastup
        |  FROM ev GROUP BY user_id)
        |SELECT user_id, n_ops,
        |  last.event_type AS last_op,
        |  CAST(last.ts_us AS BIGINT) AS last_ts_us,
        |  CAST(COALESCE(lastup.v_cents, 0) AS BIGINT) AS current_cents,
        |  CAST(CASE WHEN last.event_type = 'error' THEN 0 ELSE 1 END
        |    AS BIGINT) AS alive
        |FROM agg ORDER BY user_id""".stripMargin,
    "q_tail_latency" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |g AS (
        |  SELECT event_type, event_id,
        |    ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS gap_us
        |  FROM ev),
        |r AS (
        |  SELECT event_type, gap_us,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY gap_us, event_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM g WHERE gap_us IS NOT NULL)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
        |  CAST(MIN(CASE WHEN rn = 1 + ((n - 1) * 50) // 100 THEN gap_us END)
        |    AS BIGINT) AS p50_us,
        |  CAST(MIN(CASE WHEN rn = 1 + ((n - 1) * 95) // 100 THEN gap_us END)
        |    AS BIGINT) AS p95_us,
        |  CAST(MIN(CASE WHEN rn = 1 + ((n - 1) * 99) // 100 THEN gap_us END)
        |    AS BIGINT) AS p99_us
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_seasonality" ->
      """WITH grid AS (
        |  SELECT event_type,
        |    CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
        |    CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT event_type, dow, hr, n_events,
        |  CAST((n_events * 1000) //
        |    (SUM(n_events) OVER (PARTITION BY event_type)) AS BIGINT)
        |    AS share_permille
        |FROM grid ORDER BY event_type, dow, hr""".stripMargin,
    "q_out_of_order" ->
      // NAIVE per-type global running max on purpose: hash equality
      // proves the engine's block decomposition reproduces it exactly
      """WITH ev AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS ts_us FROM events),
        |l AS (
        |  SELECT event_type, ts_us,
        |    MAX(ts_us) OVER (PARTITION BY event_type ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM ev),
        |lat AS (
        |  SELECT event_type,
        |    CASE WHEN prevmax IS NULL OR prevmax <= ts_us THEN 0
        |         ELSE prevmax - ts_us END AS late_us
        |  FROM l)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  CAST(MAX(late_us) AS BIGINT) AS max_late_us,
        |  CAST(SUM(late_us) AS BIGINT) AS sum_late_us,
        |  CAST((SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 1000) // COUNT(*)
        |    AS BIGINT) AS late_permille
        |FROM lat GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_autocorr_lag" ->
      """WITH cnt AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
        |    CAST(COUNT(*) AS HUGEINT) AS c
        |  FROM events GROUP BY 1, 2),
        |dev AS (
        |  SELECT event_type, c,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT) AS n,
        |    SUM(c) OVER (PARTITION BY event_type) AS stot,
        |    lead(c) OVER (PARTITION BY event_type ORDER BY hr) AS cnext
        |  FROM cnt),
        |terms AS (
        |  SELECT event_type, n, stot, c,
        |    n * c - stot AS d0,
        |    CASE WHEN cnext IS NULL THEN NULL ELSE n * cnext - stot END AS d1
        |  FROM dev),
        |agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |    CAST(SUM(c) AS BIGINT) AS n_events,
        |    SUM(d0 * d1) AS num, SUM(d0 * d0) AS den
        |  FROM terms GROUP BY event_type)
        |SELECT event_type, n_hours, n_events,
        |  CAST((num * 1000000) // den AS BIGINT) AS acf1_micro
        |FROM agg WHERE den != 0 ORDER BY event_type""".stripMargin,
    "q_cusum_changepoint" ->
      """WITH cnt AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS HUGEINT) AS c
        |  FROM events GROUP BY 1, 2),
        |dev AS (
        |  SELECT event_type, day, c,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT) AS dd,
        |    SUM(c) OVER (PARTITION BY event_type) AS stot
        |  FROM cnt),
        |run AS (
        |  SELECT event_type, day, dd, stot,
        |    SUM(dd * c - stot)
        |      OVER (PARTITION BY event_type ORDER BY day
        |            ROWS UNBOUNDED PRECEDING) AS s
        |  FROM dev),
        |pick AS (
        |  SELECT event_type, dd, stot, day, abs(s) AS abs_s,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY abs(s) DESC, day) AS rk
        |  FROM run)
        |SELECT event_type, CAST(dd AS BIGINT) AS n_days,
        |  CAST(day AS BIGINT) AS cp_day,
        |  CAST((abs_s * 1000) // (dd * stot) AS BIGINT) AS cusum_permille
        |FROM pick WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "q_concurrency_curve" ->
      // NAIVE single global running sum on purpose: hash equality
      // proves the engine's two-level scan decomposition reproduces
      // the sequential sweep-line exactly
      """WITH sess AS (
        |  SELECT MIN(ts_sec) AS st, MAX(ts_sec) AS en
        |  FROM (
        |    SELECT user_id, ts_sec,
        |      CAST(SUM(CASE WHEN prev_ts IS NULL OR ts_sec - prev_ts > 604800
        |               THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS BIGINT)
        |        AS session_idx
        |    FROM (
        |      SELECT user_id, event_id, epoch_ms(ts) // 1000 AS ts_sec,
        |        lag(epoch_ms(ts) // 1000)
        |          OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) // 1000, event_id)
        |          AS prev_ts
        |      FROM events))
        |  GROUP BY user_id, session_idx),
        |deltas AS (
        |  SELECT st AS t, 1 AS dv FROM sess
        |  UNION ALL
        |  SELECT en + 1, -1 FROM sess),
        |runs AS (
        |  SELECT t // 604800 AS bucket, dv,
        |    SUM(dv) OVER (ORDER BY t, dv ROWS UNBOUNDED PRECEDING) AS run
        |  FROM deltas)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(SUM(CASE WHEN dv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
        |  CAST(SUM(CASE WHEN dv = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends,
        |  CAST(MAX(run) AS BIGINT) AS max_concurrent
        |FROM runs GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_bootstrap_ci" ->
      s"""WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
        |  FROM events),
        |pt AS (
        |  SELECT event_type, COUNT(*) AS n_rows,
        |    CAST(CAST(SUM(v_cents) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_cents
        |  FROM ev GROUP BY 1),
        |hx AS (
        |  SELECT event_type, v_cents, j,
        |    md5(CAST(event_id AS VARCHAR) || '|boot|' || CAST(j AS VARCHAR)) AS h
        |  FROM ev, LATERAL (SELECT unnest(range(0, 8)) AS j)),
        |fan AS (
        |  SELECT event_type, v_cents, j * 8 + i AS b,
        |    (CAST('0x' || substr(h, 1 + (i // 4) * 16, 15) AS BIGINT)
        |      // (CASE i % 4 WHEN 0 THEN 1 WHEN 1 THEN 32768
        |          WHEN 2 THEN 1073741824 ELSE 35184372088832 END)) % 32768 AS u
        |  FROM hx, LATERAL (SELECT unnest(range(0, 8)) AS i)),
        |wts AS (
        |  SELECT event_type, b,
        |    CAST(SUM((${poissonCdf15.map(t => s"CAST(u >= $t AS INT)")
                        .mkString(" + ")}) * v_cents) AS BIGINT) AS wsum,
        |    CAST(SUM(${poissonCdf15.map(t => s"CAST(u >= $t AS INT)")
                        .mkString(" + ")}) AS BIGINT) AS wn
        |  FROM fan GROUP BY 1, 2),
        |mb AS (
        |  SELECT event_type, b, wsum // wn AS mean_b,
        |    row_number() OVER (PARTITION BY event_type ORDER BY wsum // wn, b)
        |      AS rn
        |  FROM wts WHERE wn > 0),
        |ci AS (
        |  SELECT event_type, COUNT(*) AS n_resamples,
        |    CAST(MIN(CASE WHEN rn = 2 THEN mean_b END) AS BIGINT) AS ci_lo_cents,
        |    CAST(MIN(CASE WHEN rn = 63 THEN mean_b END) AS BIGINT) AS ci_hi_cents
        |  FROM mb GROUP BY 1)
        |SELECT pt.event_type, n_rows, mean_cents, n_resamples,
        |  ci_lo_cents, ci_hi_cents
        |FROM pt JOIN ci ON ci.event_type = pt.event_type
        |ORDER BY pt.event_type""".stripMargin,
    "q_ab_test" ->
      """WITH tagged AS (
        |  SELECT CASE WHEN CAST('0x' || substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 15)
        |                 AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    user_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
        |  FROM events),
        |agg AS (
        |  SELECT arm, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
        |    CAST(SUM(v_cents) AS BIGINT) AS sum_cents,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_purchase
        |  FROM tagged GROUP BY arm)
        |SELECT arm, n_users, n_events, sum_cents, n_purchase,
        |  CAST(sum_cents // n_events AS BIGINT) AS mean_cents,
        |  CAST((n_purchase * 1000) // n_events AS BIGINT) AS purchase_permille
        |FROM agg ORDER BY arm""".stripMargin,
    "q_funnel_time" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN epoch_ms(ts) // 1000 END) AS first_view,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) // 1000 END)
        |      AS first_purchase
        |  FROM events GROUP BY user_id),
        |conv AS (
        |  SELECT CAST(first_purchase - first_view AS BIGINT) AS delay_sec
        |  FROM per_user
        |  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        |    AND first_purchase >= first_view)
        |SELECT COUNT(*) AS n_converted,
        |  CAST(quantile_disc(delay_sec, 0.5) AS BIGINT) AS p50_sec,
        |  CAST(quantile_disc(delay_sec, 0.9) AS BIGINT) AS p90_sec
        |FROM conv""".stripMargin,
    "q_conversion_rate" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_purchase,
        |  CAST(((SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) + 1) * 1000)
        |    // (SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) + 2) AS BIGINT)
        |    AS rate_permille
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_interval_overlap" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, epoch_ms(ts) // 1000 AS ts_sec,
        |    lag(epoch_ms(ts) // 1000) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts) // 1000, event_id) AS prev
        |  FROM events),
        |marked AS (
        |  SELECT user_id, ts_sec,
        |    CAST(SUM(CASE WHEN prev IS NULL OR ts_sec - prev > 86400
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS BIGINT)
        |      AS session_idx
        |  FROM seq),
        |sess AS (
        |  SELECT user_id, session_idx,
        |    CAST(MIN(ts_sec) AS BIGINT) AS s_start,
        |    CAST(MAX(ts_sec) AS BIGINT) AS s_end
        |  FROM marked GROUP BY user_id, session_idx),
        |incidents AS (
        |  SELECT b, b * 3600 AS i_start, b * 3600 + 3599 AS i_end FROM (
        |    SELECT epoch_ms(ts) // 1000 // 3600 AS b, COUNT(*) AS n_err
        |    FROM events WHERE event_type = 'error' GROUP BY b)
        |  WHERE n_err >= 2)
        |SELECT s.user_id, s.session_idx,
        |  CAST(i.b AS BIGINT) AS incident_bucket,
        |  CAST(LEAST(s.s_end, i.i_end) - GREATEST(s.s_start, i.i_start) + 1 AS BIGINT)
        |    AS overlap_sec
        |FROM sess s JOIN incidents i
        |  ON s.s_start <= i.i_end AND i.i_start <= s.s_end
        |ORDER BY s.user_id, s.session_idx, incident_bucket""".stripMargin,
    "q_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts) // 1000, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type,
        |  COUNT(*) AS n_transitions, COUNT(DISTINCT user_id) AS n_users
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type
        |ORDER BY prev_type, next_type""".stripMargin,
    "q_window_distinct" ->
      """SELECT (epoch_ms(ts) // 1000 // 3600) * 3600 AS hour_bucket,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(DISTINCT event_id) AS n_distinct_events,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY hour_bucket ORDER BY hour_bucket""".stripMargin,
    "q_ewma_trailing" ->
      """WITH base AS (
        |  SELECT user_id, event_id, epoch_ms(ts) // 1000 AS ts_sec,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, event_id, ts_sec, v_cents,
        |    lag(v_cents, 1) OVER w AS l1,
        |    lag(v_cents, 2) OVER w AS l2,
        |    lag(v_cents, 3) OVER w AS l3
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        |SELECT user_id, event_id, ts_sec, v_cents,
        |  CAST((v_cents * 8 + COALESCE(l1, 0) * 4 + COALESCE(l2, 0) * 2 + COALESCE(l3, 0))
        |    // (8 + CASE WHEN l1 IS NULL THEN 0 ELSE 4 END
        |         + CASE WHEN l2 IS NULL THEN 0 ELSE 2 END
        |         + CASE WHEN l3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS smooth_cents
        |FROM lagged ORDER BY user_id, event_id""".stripMargin,
    "q_burst_users" ->
      """WITH hourly AS (
        |  SELECT user_id, epoch_ms(ts) // 1000 // 3600 AS hour_bucket, COUNT(*) AS n
        |  FROM events GROUP BY user_id, hour_bucket),
        |per_user AS (
        |  SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
        |    CAST(MAX(n) AS BIGINT) AS max_hour,
        |    COUNT(DISTINCT hour_bucket) AS n_hours
        |  FROM hourly GROUP BY user_id)
        |SELECT user_id, n_events, max_hour, n_hours,
        |  CAST((max_hour * 1000) // n_events AS BIGINT) AS burst_permille
        |FROM per_user
        |ORDER BY burst_permille DESC, user_id
        |LIMIT 10""".stripMargin)
}
