package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.functions.Exprs._

/** The faithful query surface of the reference's report layer
  * (storage_crawler/report.py) plus the crawl pipeline's relational
  * semantics (storage_crawler/storcrawl.py), re-expressed as Catalyst
  * plans over the driver testdata (role mapping: FIXTURES.md §1).
  *
  * Every query returns a deterministic result: total ORDER BY with a
  * unique tiebreaker, decimal casts before arithmetic on doubles, fixed
  * epoch literals instead of now() (SURVEY.md §4.3). Each entry has a
  * DuckDB twin in [[oracle]] with identical column names and types.
  *
  * Scale notes (100 TB design): every query here is a declarative plan —
  * filters and projections reach the parquet scan (PushedFilters /
  * ReadSchema), dimension joins are explicit `broadcast()`, aggregates
  * are partial+final hash aggregates, and the only full shuffles are the
  * unavoidable ones on group/join keys. Window queries partition by
  * their natural key (event_type / user_id), which distributes evenly.
  */
object Reports {

  /** Fixed "now" for P2's recency predicate (report.py:186-187,235):
    * 2001-06-01 UTC, inside the testdata's 1995..2001 date range. */
  val NowEpoch = 991353600L

  /** 3 GiB size floor and ~7.04-day recency delta, verbatim from the
    * reference (report.py:184-187,235 — Appendix A9). */
  val LargeSize = 3221225472L
  val Delta = 608400L

  type Q = (SparkSession, String) => DataFrame

  // ---- status-table analogs over `events` (ts read as epoch-nanos Long)

  /** report.py:128-131 — units='event' filter + projection + time order. */
  val qStatusEvents: Q = (s, d) => {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === "signup")
      .select(
        nanosToSec(col("ts")).as("ts_sec"),
        col("event_type").as("status"),
        col("event_id"))
      .orderBy(col("ts_sec"), col("event_id"))
  }

  /** report.py:139-145 — AVG(value) GROUP BY over a LIKE-filtered set. */
  val qStatusAverages: Q = (s, d) => {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type").like("%c%"))
      .groupBy(col("event_type").as("status"))
      .agg(
        intScaled(decAvg6(col("value")), 1000000L).as("avg_micros"),
        count(lit(1)).as("n"))
      .orderBy("status")
  }

  /** report.py:153-159 — latest row per metric (id IN (SELECT MAX(id)
    * ... GROUP BY status)), as the row_number idiom (W1). */
  val qLatestPerGroup: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy("event_type").orderBy(col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("event_type").as("status"),
        col("event_id"),
        nanosToSec(col("ts")).as("ts_sec"),
        col("value"))
      .orderBy("status")
  }

  /** storcrawl.py:503-505 — rate-from-deltas via lag() per key (W2). */
  val qRateLag: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy("user_id").orderBy("event_id")
    ev.select(
        col("user_id"),
        col("event_id"),
        nanosToSec(col("ts")).as("ts_sec"),
        intScaled(dec2(col("value")) - dec2(lag(col("value"), 1).over(w)),
          100L).as("delta_cents"))
      .orderBy("user_id", "event_id")
  }

  /** storcrawl.py:72-79,641 — global counters as one aggregate row (A1/A4). */
  val qGlobalAgg: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.agg(
      count(lit(1)).as("n_rows"),
      intScaled(decSum2(col("l_quantity")), 100L).as("sum_qty_cents"),
      intScaled(decSum2(col("l_extendedprice")), 100L).as("sum_price_cents"),
      count(when(col("l_returnflag") === "R", 1)).as("n_returned"))
  }

  /** J4 — the dimension equi-join spine: fact ⋈ orders ⋈ customer ⋈
    * nation ⋈ region with broadcast dims, grouped revenue rollup. */
  val qDimEquijoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        intScaled(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4)), 10000L).as("revenue_e4"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** S3/F9 — owners-file line parsing: pi=dir1:dir2 → exploded dim rows
    * (storcrawl.py:219-242), lines synthesized from nation⋈region. */
  val qOwnerDim: Q = (s, d) => {
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    val lines = nat
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(
        concat(
          lower(col("n_name")), lit("=/"), col("r_name"), lit("/"),
          col("n_name"), lit(":/extra/"), lower(col("n_name"))).as("line"))
    lines
      .select(
        expr("split_part(line, '=', 1)").as("pi"),
        explode(split(expr("split_part(line, '=', 2)"), ":")).as("dir"))
      .orderBy("pi", "dir")
  }

  /** J1/F1 — longest-ancestor-prefix owner lookup (find_owner,
    * storcrawl.py:245-256): explode each path into its prefixes, join
    * the owners dim, keep the deepest match. Generic machinery from
    * Exprs.ancestorPrefixes; the dim stays broadcast-sized (it is the
    * reference's in-memory dict). */
  val qOwnerPrefixJoin: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    val paths = cust
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(
        concat(lit("/"), col("r_name"), lit("/"), col("n_name"), lit("/"),
               col("c_name")).as("path"))
    val dim = reg
      .select(concat(lit("/"), col("r_name")).as("dir"),
              concat(lit("pi_region_"), col("r_name")).as("pi"))
      .unionAll(
        nat.join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .filter(col("n_nationkey") % 2 === 0)
          .select(
            concat(lit("/"), col("r_name"), lit("/"), col("n_name")).as("dir"),
            concat(lit("pi_nation_"), col("n_name")).as("pi")))
    val exploded = paths
      .select(col("path"), explode(ancestorPrefixes(col("path"))).as("a"))
      .select(col("path"), col("a.prefix").as("prefix"), col("a.depth").as("depth"))
    // LEFT-join the broadcast dim at prefix level, then take the deepest
    // NON-NULL match per path in one max_by aggregation (unmatched
    // prefixes rank at -1, so all-null paths keep a null owner). No
    // join-back to `paths` — every path has ≥1 prefix row, so the
    // aggregation itself preserves the full path set. max_by over
    // unique depths is deterministic; no window sort anywhere.
    exploded
      .join(broadcast(dim), col("prefix") === col("dir"), "left")
      .groupBy("path")
      .agg(max_by(col("pi"),
        when(col("pi").isNotNull, col("depth")).otherwise(lit(-1))).as("owner"))
      .orderBy("path")
  }

  /** P1/J3/U2 — exclusion-list anti-join (storcrawl.py:466-470). */
  val qExclusionAnti: Q = (s, d) => {
    import s.implicits._
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    val excl = Seq(".snapshot", "NATION_3", "NATION_7").toDF("name")
    cust
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(excl), col("n_name") === col("name"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("n_name"))
      .orderBy("c_custkey")
  }

  /** U1 — union of crawl roots, then a rollup (storcrawl.py:578-580). */
  val qUnionRoots: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    val a = ord.filter(col("o_orderstatus") === "F")
    val b = ord.filter(col("o_orderpriority").like("1%"))
    a.unionAll(b)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
           intScaled(decSum2(col("o_totalprice")), 100L).as("sum_total_cents"))
      .orderBy("o_orderpriority")
  }

  /** A5 — deterministic first-wins dedup (owners dict semantics,
    * storcrawl.py:238-241): first event per (user_id, event_type). */
  val qFirstWinsDedup: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy("user_id", "event_type")
  }

  /** O3 — first_thousand (report.py:166-175) with the A10 determinism
    * fix: a total ORDER BY on the unique key (l_orderkey, l_linenumber,
    * l_partkey, l_suppkey) — the testdata reuses line numbers within an
    * order, so the first two columns alone are not unique. */
  val qFirstThousand: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), epochSec(col("l_shipdate")).as("l_shipdate_sec"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .limit(1000)
  }

  /** P2+P3+O2 — large_old_files (report.py:178-209): the flagship
    * report. `orders` stands in for `files` (FIXTURES.md): st_size from
    * o_totalprice ×10⁴ (exact decimal scaling), ctime from o_orderdate,
    * mtime = ctime + deterministic skew. Predicate and sort are
    * verbatim: size ≥ 3 GiB AND changed within Δ of "now"; ORDER BY
    * GREATEST(mtime,ctime) DESC, LEAST(mtime,ctime) DESC (A9). */
  val qLargeOldFiles: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    val f = ord.select(
      col("o_orderkey").as("id"),
      (dec2(col("o_totalprice")) * lit(10000)).cast(LongType).as("st_size"),
      epochSec(col("o_orderdate")).as("st_ctime"),
      (epochSec(col("o_orderdate")) + col("o_orderkey") % 604800).as("st_mtime"))
    f.filter(
        col("st_size") >= LargeSize &&
        (col("st_ctime") + Delta >= NowEpoch ||
         col("st_mtime") + Delta >= NowEpoch))
      .orderBy(
        greatest(col("st_mtime"), col("st_ctime")).desc,
        least(col("st_mtime"), col("st_ctime")).desc,
        col("id"))
  }

  /** F2 — find_extension over p_name-derived filenames (quirks A1/A2),
    * through the native codegen expression (FindExtensionExpr),
    * registered idempotently; Exprs.findExtensionCol is the
    * builtin-composed equivalent (asserted equal in specs). */
  val qFindExtension: Q = (s, d) => {
    val reg = s.sessionState.functionRegistry
    val (ident, info, builder) = graft.GraftExtensions.findExtensionDescriptor
    if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    val part = Tables.part(s, d)
    part
      .select(
        col("p_partkey"),
        lower(expr("replace(p_name, ' ', '.')")).as("fname"))
      .withColumn("ext", expr("find_extension(fname)"))
      .orderBy("p_partkey")
  }

  /** F3 — 19-bit st_mode rendering ("{0:019b}", storcrawl.py:361). */
  val qModeBits: Q = (s, d) => {
    val part = Tables.part(s, d)
    part.select(
        col("p_partkey"),
        modeBits(col("p_size")).as("mode_bits"))
      .orderBy("p_partkey")
  }

  /** F7 — JSON extraction from the status-jsonb analog (events.props).
    * json_tuple parses the document ONCE (a generator, so the parse
    * cannot be duplicated by projection collapsing the way a repeated
    * get_json_object can); both output columns derive from the single
    * extracted field — at 100 TB the JSON parse IS the scan cost. */
  val qJsonExtract: Q = (s, d) => {
    val ev = Tables.events(s, d)
    ev.select(col("event_id"), json_tuple(col("props"), "k").as("k_str"))
      .select(
        col("event_id"),
        col("k_str"),
        col("k_str").cast(LongType).as("k_num"))
      .orderBy("event_id")
  }

  /** T1 — 60-second tumbling-window rollup (the status snapshot cadence,
    * storcrawl.py:491-528) via Spark's window() on event time. */
  val qWindowTumbling: Q = (s, d) => {
    val ev = Tables.events(s, d)
    ev.select(timestamp_seconds(nanosToSec(col("ts"))).as("t"), col("value"))
      .groupBy(window(col("t"), "60 seconds"))
      .agg(count(lit(1)).as("n_events"),
           intScaled(decSum2(col("value")), 100L).as("sum_value_cents"))
      .select(
        col("window.start").cast(LongType).as("bucket_start"),
        col("n_events"), col("sum_value_cents"))
      .orderBy("bucket_start")
  }

  /** Synthesized hierarchy: one "file" per customer at
    * /region/nation/customer with an exact-decimal size (FIXTURES.md
    * role mapping). Shared by the storage-accounting queries. */
  private def pathsWithSize(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    cust
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(
        concat(lit("/"), col("r_name"), lit("/"), col("n_name"), lit("/"),
               col("c_name")).as("path"),
        col("r_name"), col("n_name"),
        dec2(col("c_acctbal")).as("sz"))
  }

  /** du(1)-style recursive directory rollup — the storage-accounting
    * query the reference's files table exists to answer: every ancestor
    * directory gets the recursive total size and file count below it.
    * One prefix-explode + hash aggregation; at 100 TB the shuffle
    * carries (prefix, partial sums), i.e. rows × depth, never data. */
  val qDirRollup: Q = (s, d) => {
    val files = pathsWithSize(s, d)
    files
      .select(explode(ancestorPrefixes(col("path"))).as("a"), col("sz"))
      // directory prefixes only: depth 0 is the root '/', the leaf file
      // is the deepest (= number of path parts); /r and /r/n sit at
      // depths 2 and 3 in ancestorPrefixes' k-part numbering
      .filter(col("a.depth") >= 2 && col("a.depth") <= 3)
      .groupBy(col("a.prefix").as("dir"))
      .agg(
        intScaled(sum(col("sz")).cast(DecimalType(18, 2)), 100L).as("total_size_cents"),
        count(lit(1)).as("n_files"))
      .orderBy("dir")
  }

  /** Per-owner storage usage: nearest-ancestor owner attribution (J1)
    * feeding a usage rollup — the PI accounting report the reference
    * was built for (README.md:4: "collect file metadata ... attribute
    * storage to PIs"). */
  val qOwnerUsage: Q = (s, d) => {
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    val files = pathsWithSize(s, d)
    val dim = reg
      .select(concat(lit("/"), col("r_name")).as("dir"),
              concat(lit("pi_region_"), col("r_name")).as("pi"))
      .unionAll(
        nat.join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .filter(col("n_nationkey") % 2 === 0)
          .select(
            concat(lit("/"), col("r_name"), lit("/"), col("n_name")).as("dir"),
            concat(lit("pi_nation_"), col("n_name")).as("pi")))
    val exploded = files
      .select(col("path"), col("sz"), explode(ancestorPrefixes(col("path"))).as("a"))
      .select(col("path"), col("sz"), col("a.prefix").as("prefix"), col("a.depth").as("depth"))
    val owned = exploded
      .join(broadcast(dim), col("prefix") === col("dir"), "left")
      .groupBy("path")
      .agg(
        max_by(col("pi"),
          when(col("pi").isNotNull, col("depth")).otherwise(lit(-1))).as("owner"),
        first(col("sz")).as("sz"))
    owned
      .groupBy("owner")
      .agg(intScaled(sum(col("sz")).cast(DecimalType(18, 2)), 100L).as("total_size_cents"),
           count(lit(1)).as("n_files"))
      .orderBy("owner")
  }

  // ---- beyond-reference relational breadth (SURVEY §2.4/§2.3/§2.7:
  // "absent in reference; available free" — demonstrated + verified)

  /** Hierarchical rollup totals (GROUPING SETS family). NULLS FIRST is
    * pinned on both engines — their defaults differ. */
  val qRollupAgg: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    ord.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        intScaled(decSum2(col("o_totalprice")), 100L).as("sum_total_cents"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** Left outer join with per-key counts (customers with zero orders
    * kept at n_orders = 0). */
  val qOuterJoin: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
           intScaled(decSum2(col("o_totalprice")), 100L).as("sum_total_cents"))
      .orderBy("c_custkey")
  }

  /** Exact discrete quantiles per group (percentile_disc — the SQL
    * standard "smallest value with cumulative frequency ≥ p", which is
    * deterministic and engine-portable, unlike interpolating
    * percentile_cont whose FP arithmetic differs across engines, or
    * approx sketches which aren't comparable at all). Distributed as a
    * partial sort-based aggregate per group key. */
  val qQuantiles: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    def qd(p: String) = expr(
      s"CAST(percentile_disc($p) WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT)")
    li.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        qd("0.25").as("q25"), qd("0.5").as("q50"),
        qd("0.75").as("q75"), qd("0.95").as("q95"))
      .orderBy("l_returnflag")
  }

  /** Three-stage event funnel (signup → click → purchase, each stage
    * strictly after the user's entry into the previous one and within
    * a 1-day conversion window) — the
    * product-analytics staple. Per stage: one filtered min-aggregation
    * on user_id plus an equi-join to the previous stage's entry time;
    * every shuffle is keyed on user_id (high-cardinality, even), and
    * the stage tables shrink monotonically, so at 100 TB the funnel is
    * three cheap narrowing joins, not an event-level self-join. */
  val qFunnel: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), nanosToSec(col("ts")).as("t"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("t")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("t") > col("t1") && col("t") <= col("t1") + 86400L)
      .groupBy("user_id").agg(min(col("t")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("t") > col("t2") && col("t") <= col("t2") + 86400L)
      .groupBy("user_id").agg(min(col("t")).as("t3"))
    def stageCount(df: DataFrame, label: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(label).as("stage"), col("n_users"))
    stageCount(s1, "1_signup")
      .unionAll(stageCount(s2, "2_click"))
      .unionAll(stageCount(s3, "3_purchase"))
      .orderBy("stage")
  }

  /** Weekly cohort retention: users grouped by the week of their first
    * event; for each (cohort week, weeks-since-first) cell, how many of
    * the cohort were active. All time arithmetic in integer epoch-day /
    * epoch-week space (no calendar functions — engine-portable and
    * timezone-free). Two aggs + one join, everything keyed on user_id
    * then on the (cohort, offset) pair — nothing wider than the
    * distinct (user, week) activity set ever shuffles. */
  val qRetention: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), nanosToSec(col("ts")).as("sec"))
      .withColumn("day", expr("sec div 86400"))
    val first = ev.groupBy("user_id").agg(min(col("day")).as("day0"))
    ev.join(first, "user_id")
      .select(col("user_id"), expr("day0 div 7").as("cohort_week"),
        expr("(day - day0) div 7").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Gap-based sessionization — the canonical event-pipeline operator:
    * a new session starts when the gap to the previous event of the
    * same user exceeds the threshold. lag + running conditional sum
    * (one shuffle on user_id, one per-user sort), then a hash agg per
    * session. Frame note: the running sum's default frame is RANGE
    * UNBOUNDED PRECEDING..CURRENT ROW in both engines, and the window
    * order (ts_sec, event_id) is total, so RANGE == ROWS and the
    * session indices agree exactly. */
  val qSessionize: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val gap = 604800L // 7 days — the testdata spans years, not hours
    val w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    val indexed = ev
      .select(col("user_id"), col("event_id"), nanosToSec(col("ts")).as("ts_sec"))
      .withColumn("prev_ts", lag(col("ts_sec"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_sec") - col("prev_ts") > gap, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(w))
    indexed.groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_sec")).as("session_start"),
        max(col("ts_sec")).as("session_end"),
        min(col("event_id")).as("first_event_id"))
      .orderBy("user_id", "session_idx")
  }

  /** q_session_window — the same gap rule through Spark's NATIVE
    * batch `session_window` operator (the one the streaming engine
    * merges state with), pinned against the lag+islands SQL form.
    * Boundary convention, MEASURED on Spark 4.1.2 and pinned by a
    * planted spec (r12): an event at exactly `last + gap` MERGES —
    * windows that touch ([s, e) then [e, e+gap)) coalesce, so a new
    * session starts only when the delta is STRICTLY greater than the
    * gap. That is the same `> gap` rule as [[qSessionize]]'s islands
    * form (an earlier reading of this operator claimed `>=` — the sf
    * fixture has no exact-gap pair, so only the planted boundary spec
    * distinguishes the two). Emits per session the half-open window
    * bounds in epoch-micros (end = last event + gap, Spark's
    * convention), event count, cents mass, and the first event id.
    *
    * Plan: session_window plans as one user-keyed exchange + sort +
    * SessionWindowStateless aggregation — the same shuffle shape as
    * the islands form but with the session assignment fused into the
    * aggregate instead of a separate WindowExec pass. */
  val qSessionWindow: Q = (s, d) => {
    val gapUs = 604800L * 1000000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("tsm"),
        (dec2(col("value")) * 100).cast(LongType).as("v_cents"))
    ev.groupBy(col("user_id"), session_window(col("tsm"), "604800 seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v_cents")).cast(LongType).as("sum_cents"),
        min(col("event_id")).cast(LongType).as("first_event_id"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"), col("sum_cents"), col("first_event_id"))
      .orderBy("user_id", "start_us")
  }

  /** Full CUBE over (status, priority) — all four grouping-set layers
    * (GROUPING SETS family beyond ROLLUP). */
  val qCubeAgg: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    ord.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        intScaled(decSum2(col("o_totalprice")), 100L).as("sum_total_cents"))
      .orderBy(
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** EXISTS-style semi join: customers having at least one urgent
    * order (planned as left_semi — no row multiplication, the shape an
    * EXISTS subquery should always take). */
  val qExistsSemi: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
    cust.join(
        ord.filter(col("o_orderpriority").like("1%")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Per-customer running order total (explicit ROWS frame, pinned on
    * both engines, over a total order — date ties broken by key). */
  val qRunningTotal: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate_sec", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.select(
        col("o_custkey"), col("o_orderkey"),
        epochSec(col("o_orderdate")).as("o_orderdate_sec"),
        dec2(col("o_totalprice")).as("p"))
      .withColumn("running_cents", intScaled(sum(col("p")).over(w), 100L))
      .drop("p")
      .orderBy("o_custkey", "o_orderdate_sec", "o_orderkey")
  }

  /** PIVOT: order counts per priority with one column per status
    * (explicit pivot value list, so the plan is a single pass of
    * conditional aggregates — no distinct-values pre-query). */
  val qPivot: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    ord.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(
        col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")
  }

  /** UNPIVOT (melt): the wide pivot output back to long form — one
    * Expand node, no shuffle beyond the upstream aggregation. */
  val qUnpivot: Q = (s, d) => {
    qPivot(s, d).unpivot(
        Array(col("o_orderpriority")),
        Array(col("n_f"), col("n_o"), col("n_p")),
        "status_col", "n")
      .orderBy("o_orderpriority", "status_col")
  }

  /** Ranking-function family over one total per-priority order:
    * dense_rank, ntile(4), percent_rank (its (rank−1)/(n−1) double is
    * an exact small-integer division, correctly rounded identically in
    * both engines — safe to emit, unlike decimal-derived doubles). */
  val qNtileRank: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("cents"), col("o_orderkey"))
    ord.select(
        col("o_orderkey"), col("o_orderpriority"),
        intScaled(dec2(col("o_totalprice")), 100L).as("cents"))
      .withColumn("drank", dense_rank().over(w).cast(LongType))
      .withColumn("quartile", ntile(4).over(w).cast(LongType))
      .withColumn("prank", percent_rank().over(w))
      .orderBy("o_orderpriority", "cents", "o_orderkey")
  }

  /** Ordered string aggregation (LISTAGG/string_agg semantics) via the
    * deterministic sort-then-join form — order pinned by value, so
    * both engines emit identical strings. */
  val qStringAgg: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .filter(col("c_custkey") % 100 === 0) // keep the strings readable
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n"),
        array_join(array_sort(collect_list(col("c_name"))), ",").as("names"))
      .orderBy("n_name")
  }

  /** INTERSECT: nation keys present among both customers and suppliers. */
  val qSetOps: Q = (s, d) => {
    val cust = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val supp = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    cust.intersect(supp).orderBy("nationkey")
  }

  /** q_market_share — the deep relational spine (TPC-H Q8 flavor):
    * within the ASIA-region customers' order volume, what share of
    * yearly revenue do NATION_2's suppliers capture? Six tables —
    * lineitem ⋈ orders ⋈ customer ⋈ nation(cust) ⋈ region plus
    * supplier ⋈ nation(supp) — with every dimension broadcast and the
    * fact table shuffled ONCE (AQE sees four sub-MB dims, the
    * customer-side region filter prunes before the fact join). Revenue
    * is exact: dec2 cents algebra into a DECIMAL(18,4) sum, e4-scaled
    * Longs out, permille share by integer div — no float summation
    * order anywhere. The canonical "is the optimizer doing its job"
    * query: a wrong join order or a missed broadcast shows up as an
    * extra fact shuffle in .explain before it shows up in the wall.
    */
  val qMarketShare: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val cust = Tables.customer(s, d)
    val supp = Tables.supplier(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    val custAsia = cust
      .join(broadcast(nat.select(col("n_nationkey").as("cnk"),
        col("n_regionkey").as("crk"))), col("c_nationkey") === col("cnk"))
      .join(broadcast(reg.filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))), col("crk") === col("r_regionkey"))
      .select("c_custkey")
    val suppNation = supp
      .join(broadcast(nat.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(custAsia, col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .withColumn("rev", dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(
        intScaled(sum(col("rev")).cast(DecimalType(18, 4)), 10000L)
          .as("total_e4"),
        intScaled(sum(when(col("supp_nation") === "NATION_2", col("rev"))
          .otherwise(lit(0))).cast(DecimalType(18, 4)), 10000L)
          .as("nation_e4"))
      .withColumn("share_permille",
        expr("(nation_e4 * 1000) div total_e4").cast(LongType))
      .orderBy("o_year")
  }

  val queries: Map[String, Q] = Map(
    "q_market_share" -> qMarketShare,
    "q_dir_rollup" -> qDirRollup,
    "q_owner_usage" -> qOwnerUsage,
    "q_rollup_agg" -> qRollupAgg,
    "q_quantiles" -> qQuantiles,
    "q_sessionize" -> qSessionize,
    "q_session_window" -> qSessionWindow,
    "q_funnel" -> qFunnel,
    "q_retention" -> qRetention,
    "q_cube_agg" -> qCubeAgg,
    "q_pivot" -> qPivot,
    "q_unpivot" -> qUnpivot,
    "q_ntile_rank" -> qNtileRank,
    "q_string_agg" -> qStringAgg,
    "q_exists_semi" -> qExistsSemi,
    "q_running_total" -> qRunningTotal,
    "q_outer_join" -> qOuterJoin,
    "q_set_ops" -> qSetOps,
    "q_status_events" -> qStatusEvents,
    "q_status_averages" -> qStatusAverages,
    "q_latest_per_group" -> qLatestPerGroup,
    "q_rate_lag" -> qRateLag,
    "q_global_agg" -> qGlobalAgg,
    "q_dim_equijoin" -> qDimEquijoin,
    "q_owner_dim" -> qOwnerDim,
    "q_owner_prefix_join" -> qOwnerPrefixJoin,
    "q_exclusion_anti" -> qExclusionAnti,
    "q_union_roots" -> qUnionRoots,
    "q_first_wins_dedup" -> qFirstWinsDedup,
    "q_first_thousand" -> qFirstThousand,
    "q_large_old_files" -> qLargeOldFiles,
    "q_find_extension" -> qFindExtension,
    "q_mode_bits" -> qModeBits,
    "q_json_extract" -> qJsonExtract,
    "q_window_tumbling" -> qWindowTumbling
  )

  /** DuckDB twins — same column names, same types, same total order. */
  val oracle: Map[String, String] = Map(
    "q_dir_rollup" ->
      """WITH f AS (
        |  SELECT '/' || r_name || '/' || n_name || '/' || c_name AS path,
        |         r_name, n_name, CAST(c_acctbal AS DECIMAL(18,2)) AS sz
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey)
        |SELECT dir, CAST(CAST(SUM(sz) AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_size_cents, COUNT(*) AS n_files
        |FROM (SELECT '/' || r_name AS dir, sz FROM f
        |      UNION ALL
        |      SELECT '/' || r_name || '/' || n_name AS dir, sz FROM f)
        |GROUP BY dir ORDER BY dir""".stripMargin,
    "q_owner_usage" ->
      """WITH f AS (
        |  SELECT '/' || r_name || '/' || n_name || '/' || c_name AS path,
        |         r_name, n_name, CAST(c_acctbal AS DECIMAL(18,2)) AS sz
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |nat AS (
        |  SELECT '/' || r_name || '/' || n_name AS dir,
        |         'pi_nation_' || n_name AS pi
        |  FROM nation JOIN region ON n_regionkey = r_regionkey
        |  WHERE n_nationkey % 2 = 0),
        |reg AS (SELECT '/' || r_name AS dir, 'pi_region_' || r_name AS pi FROM region)
        |SELECT owner, CAST(CAST(SUM(sz) AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_size_cents, COUNT(*) AS n_files
        |FROM (SELECT coalesce(n.pi, r.pi) AS owner, f.sz
        |      FROM f
        |      LEFT JOIN nat n ON '/' || f.r_name || '/' || f.n_name = n.dir
        |      LEFT JOIN reg r ON '/' || f.r_name = r.dir)
        |GROUP BY owner ORDER BY owner""".stripMargin,
    "q_cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS sum_total_cents
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_unpivot" ->
      """WITH p AS (
        |  SELECT o_orderpriority,
        |    COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |    COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |    COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, status_col, n FROM (
        |  SELECT o_orderpriority, 'n_f' AS status_col, n_f AS n FROM p
        |  UNION ALL
        |  SELECT o_orderpriority, 'n_o', n_o FROM p
        |  UNION ALL
        |  SELECT o_orderpriority, 'n_p', n_p FROM p)
        |ORDER BY o_orderpriority, status_col""".stripMargin,
    "q_ntile_rank" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS prank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), o_orderkey)
        |ORDER BY o_orderpriority, cents, o_orderkey""".stripMargin,
    "q_string_agg" ->
      """SELECT n_name, COUNT(*) AS n,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey % 100 = 0
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_exists_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority LIKE '1%')
        |ORDER BY c_custkey""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) // 1000 AS o_orderdate_sec,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey
        |          ORDER BY epoch_ms(o_orderdate) // 1000, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT) AS running_cents
        |FROM orders ORDER BY o_custkey, o_orderdate_sec, o_orderkey""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) // 1000 AS t FROM events),
        |s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(t) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND t > t1 AND t <= t1 + 86400 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(t) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND t > t2 AND t <= t2 + 86400 GROUP BY e.user_id)
        |SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
        |UNION ALL SELECT '2_click', COUNT(*) FROM s2
        |UNION ALL SELECT '3_purchase', COUNT(*) FROM s3
        |ORDER BY stage""".stripMargin,
    "q_retention" ->
      """WITH e AS (
        |  SELECT user_id, (epoch_ms(ts) // 1000) // 86400 AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS day0 FROM e GROUP BY user_id),
        |x AS (SELECT DISTINCT e.user_id, day0 // 7 AS cohort_week,
        |        (day - day0) // 7 AS week_offset
        |      FROM e JOIN f USING (user_id))
        |SELECT cohort_week, week_offset, COUNT(*) AS n_users
        |FROM x GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_sessionize" ->
      """SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  min(ts_sec) AS session_start, max(ts_sec) AS session_end,
        |  min(event_id) AS first_event_id
        |FROM (
        |  SELECT user_id, event_id, ts_sec,
        |    CAST(SUM(CASE WHEN prev_ts IS NULL OR ts_sec - prev_ts > 604800
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS BIGINT) AS session_idx
        |  FROM (
        |    SELECT user_id, event_id, epoch_ms(ts) // 1000 AS ts_sec,
        |      lag(epoch_ms(ts) // 1000)
        |        OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) // 1000, event_id) AS prev_ts
        |    FROM events))
        |GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,
    "q_session_window" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
        |  FROM events),
        |g AS (
        |  SELECT user_id, event_id, ts_us, v_cents,
        |    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id) IS NULL
        |      OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id) > 604800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM ev),
        |s AS (
        |  SELECT user_id, event_id, ts_us, v_cents,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, CAST(MIN(ts_us) AS BIGINT) AS start_us,
        |  CAST(MAX(ts_us) + 604800000000 AS BIGINT) AS end_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(v_cents) AS BIGINT) AS sum_cents,
        |  CAST(MIN(event_id) AS BIGINT) AS first_event_id
        |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    "q_quantiles" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.25) AS BIGINT) AS q25,
        |  CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.5) AS BIGINT) AS q50,
        |  CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.75) AS BIGINT) AS q75,
        |  CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.95) AS BIGINT) AS q95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_rollup_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS sum_total_cents,
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS sum_total_cents
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_set_ops" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_status_events" ->
      """SELECT epoch_ms(ts) // 1000 AS ts_sec, event_type AS status, event_id
        |FROM events WHERE event_type = 'signup'
        |ORDER BY ts_sec, event_id""".stripMargin,
    "q_status_averages" ->
      """SELECT event_type AS status,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) / COUNT(value) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS avg_micros,
        |  COUNT(*) AS n
        |FROM events WHERE event_type LIKE '%c%'
        |GROUP BY event_type ORDER BY status""".stripMargin,
    "q_latest_per_group" ->
      """SELECT event_type AS status, event_id, epoch_ms(ts) // 1000 AS ts_sec, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY status""".stripMargin,
    "q_rate_lag" ->
      """SELECT user_id, event_id, epoch_ms(ts) // 1000 AS ts_sec,
        |  CAST((CAST(value AS DECIMAL(18,2))
        |       - lag(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id))
        |       * 100 AS BIGINT) AS delta_cents
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_global_agg" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS sum_qty_cents,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS sum_price_cents,
        |  COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned
        |FROM lineitem""".stripMargin,
    "q_market_share" ->
      """WITH cust_asia AS (
        |  SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |supp_nat AS (
        |  SELECT s_suppkey, n_name AS supp_nation FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey),
        |facts AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |    supp_nation,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(1 - l_discount AS DECIMAL(18,2)) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN cust_asia ON o_custkey = c_custkey
        |  JOIN supp_nat ON l_suppkey = s_suppkey),
        |agg AS (
        |  SELECT o_year,
        |    CAST(CAST(SUM(rev) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS total_e4,
        |    CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev
        |                       ELSE 0 END) AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |      AS nation_e4
        |  FROM facts GROUP BY o_year)
        |SELECT o_year, total_e4, nation_e4,
        |  CAST((nation_e4 * 1000) // total_e4 AS BIGINT) AS share_permille
        |FROM agg ORDER BY o_year""".stripMargin,
    "q_dim_equijoin" ->
      """SELECT r_name, n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS revenue_e4,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_owner_dim" ->
      """SELECT pi, dir FROM (
        |  SELECT split_part(line, '=', 1) AS pi,
        |         unnest(string_split(split_part(line, '=', 2), ':')) AS dir
        |  FROM (SELECT lower(n_name) || '=/' || r_name || '/' || n_name
        |               || ':/extra/' || lower(n_name) AS line
        |        FROM nation JOIN region ON n_regionkey = r_regionkey))
        |ORDER BY pi, dir""".stripMargin,
    "q_owner_prefix_join" ->
      """WITH paths AS (
        |  SELECT '/' || r_name || '/' || n_name || '/' || c_name AS path,
        |         r_name, n_name
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |nat AS (
        |  SELECT '/' || r_name || '/' || n_name AS dir,
        |         'pi_nation_' || n_name AS pi
        |  FROM nation JOIN region ON n_regionkey = r_regionkey
        |  WHERE n_nationkey % 2 = 0),
        |reg AS (SELECT '/' || r_name AS dir, 'pi_region_' || r_name AS pi FROM region)
        |SELECT p.path, coalesce(n.pi, r.pi) AS owner
        |FROM paths p
        |LEFT JOIN nat n ON '/' || p.r_name || '/' || p.n_name = n.dir
        |LEFT JOIN reg r ON '/' || p.r_name = r.dir
        |ORDER BY path""".stripMargin,
    "q_exclusion_anti" ->
      """SELECT c_custkey, c_name, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name NOT IN ('.snapshot', 'NATION_3', 'NATION_7')
        |ORDER BY c_custkey""".stripMargin,
    "q_union_roots" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS sum_total_cents
        |FROM (SELECT * FROM orders WHERE o_orderstatus = 'F'
        |      UNION ALL
        |      SELECT * FROM orders WHERE o_orderpriority LIKE '1%')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_first_wins_dedup" ->
      """SELECT user_id, event_type, event_id
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q_first_thousand" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        |  epoch_ms(l_shipdate) // 1000 AS l_shipdate_sec
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 1000""".stripMargin,
    "q_large_old_files" ->
      s"""WITH f AS (
        |  SELECT o_orderkey AS id,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 10000 AS BIGINT) AS st_size,
        |    epoch_ms(o_orderdate) // 1000 AS st_ctime,
        |    epoch_ms(o_orderdate) // 1000 + o_orderkey % 604800 AS st_mtime
        |  FROM orders)
        |SELECT id, st_size, st_ctime, st_mtime FROM f
        |WHERE st_size >= $LargeSize
        |  AND (st_ctime + $Delta >= $NowEpoch OR st_mtime + $Delta >= $NowEpoch)
        |ORDER BY greatest(st_mtime, st_ctime) DESC, least(st_mtime, st_ctime) DESC, id""".stripMargin,
    "q_find_extension" ->
      s"""SELECT p_partkey, fname, ${graft.functions.Exprs.findExtensionDuckSql("fname")} AS ext
        |FROM (SELECT p_partkey, lower(replace(p_name, ' ', '.')) AS fname FROM part)
        |ORDER BY p_partkey""".stripMargin,
    "q_mode_bits" ->
      """SELECT p_partkey, lpad(bin(p_size), 19, '0') AS mode_bits
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events ORDER BY event_id""".stripMargin,
    "q_window_tumbling" ->
      """SELECT (epoch_ms(ts) // 1000) // 60 * 60 AS bucket_start,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
