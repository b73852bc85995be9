package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, TimestampType}

import graft.Tables
import graft.functions.Exprs._

/** Round-4 relational-breadth queries: grouping sets, bounded window
  * frames, FILTER-clause aggregation, correlated scalar subqueries,
  * deterministic mode, multi-join top-k revenue, calendar bucketing,
  * and higher-order array functions — each with an exact DuckDB twin.
  *
  * Determinism follows the house rules: money as exact-decimal cents /
  * e4 integers (never DECIMAL in a final SELECT), window frames pinned
  * to ROWS with a unique ordering tiebreaker, NULLS FIRST pinned on
  * rollup sorts, array math in scaled-integer space (exact, order-
  * independent).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** o_totalprice as exact integer cents. */
  private def orderCents = (dec2(col("o_totalprice")) * 100).cast(LongType)

  /** GROUPING SETS with grouping_id — the general form behind the
    * already-verified CUBE/ROLLUP: per (flag,status), per flag, and
    * grand total in ONE pass (Spark expands to a single shuffle with
    * one replicated aggregate, not three scans). */
  val qGroupingSets: Q = (s, d) =>
    s.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  COUNT(*) AS n,
         |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_cents
         |FROM parquet.`$d/lineitem.parquet`
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)

  /** Bounded moving-window frame: per-customer trailing-4-order spend.
    * ROWS (not the default RANGE) with a unique (date, orderkey)
    * ordering, so the frame contents are identical across engines. */
  val qMovingWindow: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-3, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        orderCents.as("cents"))
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        sum(col("cents")).over(w).cast(LongType).as("mov_cents"),
        count(lit(1)).over(w).cast(LongType).as("n_win"))
      .orderBy("o_orderkey")
  }

  /** FILTER-clause conditional aggregation (count/sum over different
    * predicates in one pass — one shuffle, no self-joins). */
  val qFilteredAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_all"),
        count(when(col("l_quantity") > 25d, 1)).as("n_big"),
        sum(when(col("l_discount") < 0.03d, dec2(col("l_extendedprice"))))
          .cast(DecimalType(18, 2)).*(100).cast(LongType).as("lowdisc_cents"))
      .orderBy("l_returnflag")

  /** Multi-join top-k: revenue per order (the TPC-H Q3 shape) — partial
    * aggregation on lineitem BEFORE the orders join, so the join input
    * is one row per order, then a global top-10 (TakeOrderedAndProject,
    * no full sort). */
  val qTopRevenueOrders: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4)).*(10000).cast(LongType).as("revenue_e4"))
    rev.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Deterministic mode(): most common priority per order status, ties
    * broken by value — engines disagree on bare mode()'s tie choice, so
    * the plan IS the definition (count desc, value asc, row_number=1). */
  val qMostCommon: Q = (s, d) => {
    val counts = Tables.orders(s, d)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("n").desc, col("o_orderpriority"))
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"), col("n"))
      .orderBy("o_orderstatus")
  }

  /** Correlated scalar subquery: orders above their customer's average
    * spend. The comparison is exact integer cross-multiplication
    * (cents·count > sum_cents) — no division, no floats, so the oracle's
    * correlated form and this join form agree bit-for-bit. Spark plans
    * the decorrelated join automatically for the SQL form too; here the
    * join is explicit (one shuffle on custkey + broadcast-sized agg). */
  val qCorrelatedScalar: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), orderCents.as("cents"))
    val agg = o.groupBy(col("o_custkey"))
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n_orders"))
    o.join(agg, "o_custkey")
      .filter(col("cents") * col("n_orders") > col("sum_cents"))
      .select(col("o_orderkey"), col("cents"))
      .orderBy("o_orderkey")
  }

  /** Calendar bucketing: monthly order rollup keyed by yyyymm (integer,
    * tz-stable under the pinned UTC session). */
  val qDateBuckets: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast(LongType).as("yyyymm"))
      .agg(count(lit(1)).as("n_orders"),
           sum(orderCents).as("sum_cents"))
      .orderBy("yyyymm")

  /** Higher-order array functions over embeddings: positive-coordinate
    * count (filter+size) and an EXACT integer sum of squares in 1e-16
    * units (each coord → DECIMAL(12,8) → scaled long; |x| < 1 and 64
    * dims keep the sum far under 2^63). No floats anywhere. */
  val qArrayHof: Q = (s, d) => {
    val e8 = transform(col("embedding"),
      x => (x.cast(DoubleType).cast(DecimalType(12, 8)) * 100000000L).cast(LongType))
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(filter(col("embedding"), x => x > 0f)).cast(LongType).as("n_pos"),
        aggregate(e8, lit(0L), (acc, v) => acc + v * v).as("ssq_e16"))
      .orderBy("vec_id")
  }

  /** Per-document term-frequency top-k: the tf side of tf-idf — word
    * explode, (doc, word) hash count, top-3 per doc with ties broken by
    * the word itself. One explode + one partial-aggregated shuffle +
    * one per-doc window over exactly 3+ rows. */
  val qTfTopk: Q = (s, d) => {
    val words = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("word"))
    tf.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 3)
      .orderBy("doc_id", "rnk")
  }

  /** Document frequency per token (the idf denominator, kept integer —
    * ln() is libm-dependent and belongs in the float production path):
    * COUNT(DISTINCT doc) per word, words appearing in ≥ 5% of docs.
    * Partial distinct-aggregation keeps the shuffle at (word, doc_id)
    * pairs, never raw text. */
  val qDocFreq: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // corpus size as a broadcast scalar, not an eager driver count():
    // the plan stays one lazy job and the doc scan is not repeated
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 20 >= col("n_docs"))
      .select(col("word"), col("df"))
      .orderBy(col("df").desc, col("word"))
  }

  /** Interval-containment range join through the custom plan path
    * ([[graft.plans.RangeJoin]] → `RangeJoinExec`): order dates stabbed
    * against per-lineitem shipment windows `[shipdate, shipdate +
    * quantity days]`. The oracle is the plain BETWEEN join; the engine
    * plans the broadcast sorted-interval binary search instead of
    * Catalyst's O(n·m) BroadcastNestedLoopJoin. Epoch-second BIGINT
    * space on both sides (timestamp→long casts floor identically);
    * quantity floor()'d explicitly (Spark CAST truncates, DuckDB
    * rounds — floor is the one shared spelling). */
  val qRangeJoin: Q = (s, d) => {
    val points = Tables.orders(s, d)
      .filter(col("o_orderkey") % 127 === 0)
      .select(col("o_orderkey").as("point_key"),
        col("o_orderdate").cast(TimestampType).cast(LongType).as("p_s"))
    val intervals = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 89 === 0)
      .select(
        (col("l_orderkey") * 100 + col("l_linenumber")).cast(LongType).as("iv_id"),
        col("l_shipdate").cast(TimestampType).cast(LongType).as("lo_s"),
        (col("l_shipdate").cast(TimestampType).cast(LongType)
          + floor(col("l_quantity")).cast(LongType) * 86400L).as("hi_s"))
    graft.plans.Graft.rangeJoin(points, intervals, "p_s", "lo_s", "hi_s")
      .select(col("point_key"), col("iv_id"), col("p_s"), col("lo_s"), col("hi_s"))
      // hi_s completes the total order: iv_id collides (the testdata's
      // (l_orderkey, l_linenumber) is NOT unique) and tied rows may
      // differ in hi_s — without it the hash gate could flake on order
      .orderBy(col("point_key"), col("iv_id"), col("lo_s"), col("hi_s"))
  }

  /** Exact integer covariance: `n·Σxy − Σx·Σy` per group over scaled
    * integers (quantity units × floor-dollars). covar_pop/samp are
    * float folds whose summation order differs across engines; this
    * carries the full numerator exactly. The numerator grows ~sf², so
    * (a) the fact side is sampled on orderkey (deterministic, ~1/7 —
    * headroom through sf≈50), and (b) all aggregation runs in
    * DECIMAL(38,0), mirroring DuckDB's HUGEINT promotion: if the value
    * ever did exceed the headroom, Spark yields decimal overflow (null
    * / error) instead of a silently wrapped long that the oracle gate
    * would flag as a plain mismatch. */
  val qCovariance: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_returnflag"),
        // floor, not bare cast: Spark CAST truncates, DuckDB rounds —
        // floor is the one shared spelling (values are integral today,
        // but the oracle must not depend on that)
        floor(col("l_quantity")).cast(DecimalType(20, 0)).as("qd"),
        floor(col("l_extendedprice")).cast(DecimalType(20, 0)).as("cd"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        (count(lit(1)).cast(DecimalType(20, 0)) * sum(col("qd") * col("cd"))
          - sum(col("qd")) * sum(col("cd"))).cast(LongType).as("cov_n2"))
      .orderBy("l_returnflag")

  /** Multiset set operations (INTERSECT ALL / EXCEPT ALL — bag
    * semantics, min/difference of multiplicities) between rich-customer
    * and supplier nation keys, folded to (op, key, multiplicity). */
  val qMultisetOps: Q = (s, d) => {
    val a = Tables.customer(s, d).filter(col("c_acctbal") > 5000d)
      .select(col("c_nationkey").as("k"))
    val b = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
    val ia = a.intersectAll(b).withColumn("op", lit("ia"))
    val ea = a.exceptAll(b).withColumn("op", lit("ea"))
    ia.unionByName(ea)
      .groupBy(col("op"), col("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy("op", "k")
  }

  /** Time-series gap filling: a generated month spine LEFT JOINed to
    * per-month order counts — missing months surface as explicit zero
    * rows (the standard reporting fix for sparse group-bys). The spine
    * is `spark.range`, not a table scan; counts broadcast. */
  val qGapFill: Q = (s, d) => {
    val months = s.range(0, 84).toDF("i")
      .select((lit(1992) + col("i") / 12).cast(LongType).as("y"),
        (col("i") % 12 + 1).cast(LongType).as("m"))
    val counts = Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast(LongType).as("y"),
        month(col("o_orderdate")).cast(LongType).as("m"))
      .agg(count(lit(1)).as("n"))
    months.join(broadcast(counts), Seq("y", "m"), "left")
      .select((col("y") * 100 + col("m")).cast(LongType).as("yyyymm"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy("yyyymm")
  }

  /** RANGE window frame over integer epoch-days: true 30-DAY trailing
    * spend per customer (peers at the same day all join the frame —
    * value-based, unlike the ROWS frame of q_moving_window). Sum over
    * a set, so same-day tie order cannot change the answer. */
  val qTrailingWindow: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("d")
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        // integer `div` (not `/`, which is double division in the
        // Column API) — matches DuckDB's `//` floor on positive epochs
        expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400").as("d"),
        orderCents.as("cents"))
      .withColumn("trail_cents", sum(col("cents")).over(w).cast(LongType))
      .drop("cents")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Regex extraction parity: first ≥7-letter lowercase word per doc.
    * Conservative pattern (plain character class + bounded repeat) —
    * identical semantics in Java regex (Spark) and RE2 (DuckDB);
    * filtered to matches so the no-match sentinel ('' vs NULL) never
    * reaches the output. */
  val qRegexExtract: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract(lower(col("text")), "([a-z]{7,})", 1).as("long_word"))
      .filter(length(col("long_word")) > 0)
      .orderBy("doc_id")

  /** Fixed-width value histogram of order totals: bucket = integer
    * division of cents by $50k — one hash agg, the classic profile
    * query. Integer `div` on both engines (Column `/` is double). */
  val qHistogram: Q = (s, d) =>
    Tables.orders(s, d)
      .select(orderCents.as("cents"))
      .groupBy(expr("cents div 5000000").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).cast(LongType).as("sum_cents"))
      .orderBy("bucket")

  /** Generator with ordinality: first five words of each document with
    * their positions (posexplode ↔ DuckDB list indexing over a LATERAL
    * range — same construction as the gram queries, positions pinned
    * 0-based on both sides). */
  val qPosexplode: Q = (s, d) =>
    Tables.documents(s, d)
      // NULL guard pinned on BOTH sides: posexplode of a NULL array
      // emits zero rows but DuckDB's least(len(NULL), 5) = 5 emits
      // five NULL words — the equivalence must not hinge on the
      // fixture having no NULL text
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(slice(split(col("text"), " "), 1, 5)))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        col("col").as("word"))
      .orderBy("doc_id", "pos")

  /** first_value / nth_value with the full-partition ROWS frame (the
    * default frame stops at CURRENT ROW, where nth_value(2) would be
    * NULL on the first row — the explicit frame is the portable
    * spelling): each customer's first and second order spend under the
    * pinned (date, orderkey) total order. */
  val qFirstLast: Q = (s, d) => {
    val ord = Window.partitionBy("o_custkey")
      .orderBy(col("d"), col("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT)").as("d"),
        orderCents.as("cents"))
      .withColumn("first_cents", first(col("cents")).over(full).cast(LongType))
      .withColumn("second_cents", nth_value(col("cents"), 2).over(full).cast(LongType))
      .withColumn("rn", row_number().over(ord))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("first_cents"), col("second_cents"))
      .orderBy("o_custkey")
  }

  /** The skew machinery proven exact through the oracle gate: per-
    * supplier revenue via [[Skew.saltedSumCount]] (spread each group
    * over 8 salt cells, partial-agg, merge) must equal the plain GROUP
    * BY the oracle runs. Sum/count are algebraic, so the two-phase
    * result is independent of the (random) salt assignment — which is
    * exactly why salting is safe to deploy on a hot key at 100 TB. */
  val qSaltedAgg: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey"), intScaled(dec2(col("l_extendedprice")), 100L).as("cents"))
    Skew.saltedSumCount(li, col("l_suppkey"), col("cents"), buckets = 8)
      .select(col("k").as("l_suppkey"), col("sum_value").as("revenue_cents"), col("n"))
      .orderBy("l_suppkey")
  }

  /** q_skyline — 2-D Pareto frontier (skyline operator, Börzsönyi et
    * al. ICDE 2001): orders not dominated on (maximize o_totalprice,
    * minimize o_orderdate). A point q is dominated iff some p has
    * price ≥ / date ≤ with one strict — equivalently (two range-frame
    * windows, no self-join, no NOT EXISTS quadratic scan):
    *   min(date) over price ≥ q.price  <  q.date   (strict-in-date p)
    *   max(price) over date ≤ q.date   >  q.price  (strict-in-price p)
    * Peers (RANGE ... CURRENT ROW) include q itself, which can never
    * satisfy its own strict inequality — so ties and exact duplicates
    * get standard skyline semantics for free.
    *
    * Scale shape: a global window is a single-partition sort, so the
    * frontier is computed in two phases — phase 1 runs the SAME window
    * pair partitioned by a hash bucket (32-way parallel; a point
    * dominated within any subset is dominated globally, so pruning is
    * safe), phase 2 runs the global pair over the survivors, which are
    * frontier-sized (O(log n) on non-adversarial data), not
    * corpus-sized. */
  val qSkyline: Q = (s, d) => {
    def pass(df: DataFrame, bucket: Option[org.apache.spark.sql.Column]): DataFrame = {
      val base = bucket.map(Window.partitionBy(_)).getOrElse(Window.partitionBy())
      val wPrice = base.orderBy(col("o_totalprice").desc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wDate = base.orderBy(col("o_orderdate").asc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("min_d", min("o_orderdate").over(wPrice))
        .withColumn("max_p", max("o_totalprice").over(wDate))
        .filter(!(col("min_d") < col("o_orderdate")) &&
          !(col("max_p") > col("o_totalprice")))
        .drop("min_d", "max_p")
    }
    val orders = Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice", "o_orderdate")
    val local = pass(orders, Some(pmod(hash(col("o_orderkey")), lit(32))))
    pass(local, None).orderBy("o_orderkey")
  }

  /** q_rendezvous_shards — highest-random-weight (rendezvous) sharding
    * audit (Thaler & Ravishankar 1998, the consistent-placement scheme
    * behind cacheless routing): every document goes to
    * argmaxᵢ md5('hrw|' ‖ i ‖ '|' ‖ doc_id) over the shard set; the
    * report shows per-shard balance at N = 8 and what an expansion to
    * N = 9 moves. HRW's defining property — displaced keys relocate
    * ONLY to the new shard (an existing shard's weight never changes,
    * so rankings among the old 8 are untouched) — is emitted as the
    * `n_moved_elsewhere` column so the oracle PINS it at zero rather
    * than the scaladoc asserting it; expected move share is 1/9 of
    * the corpus.
    *
    * Scale shape: assignment is a scan-side 8-way (then 9-way)
    * sequence explode + a doc-keyed row_number window (high-
    * cardinality key, balanced by construction); the rollup is an
    * 8-group aggregate. No coordination state anywhere — the whole
    * point of HRW placement on a 1000-node fleet. */
  val qRendezvousShards: Q = (s, d) => {
    def assign(n: Int, outCol: String): DataFrame = {
      val wnd = Window.partitionBy("doc_id").orderBy(col("w").desc, col("i"))
      Tables.documents(s, d).select(col("doc_id"))
        .select(col("doc_id"), explode(sequence(lit(0), lit(n - 1))).as("i"))
        .withColumn("w", md5Long(concat(lit("hrw|"), col("i").cast("string"),
          lit("|"), col("doc_id").cast("string"))))
        .withColumn("rn", row_number().over(wnd))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("i").cast(LongType).as(outCol))
    }
    assign(8, "shard").join(assign(9, "shard9"), Seq("doc_id"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard9") =!= col("shard"), 1L).otherwise(0L))
          .cast(LongType).as("n_moved"),
        sum(when(col("shard9") =!= col("shard") && col("shard9") =!= 8, 1L)
          .otherwise(0L)).cast(LongType).as("n_moved_elsewhere"))
      .withColumn("moved_permille",
        expr("(n_moved * 1000) div n_docs").cast(LongType))
      .orderBy("shard")
  }

  /** q_join_size_proof — join cardinality WITHOUT the join: the size
    * of the events self-join on user_id is Σᵤ c(u)² over the key
    * histogram, computed here per event_type pair collapsed to one
    * global row (n_rows, n_keys, the predicted self-join size, and
    * the hottest key's count). The engine never materializes a joined
    * row — one key-count aggregate and a sum of squares; the DuckDB
    * twin COUNTs the actual row self-join. Hash equality proves the
    * identity every optimizer's cardinality estimator (and every
    * skew-blowup warning) relies on — and demonstrates the 100 TB
    * answer to "how big would this join get": ask the histogram, not
    * the join. max_key³ vs n_join is the skew diagnostic: one hot key
    * quadratically dominating the output is THE salting trigger. */
  val qJoinSizeProof: Q = (s, d) => {
    val dec = DecimalType(38, 0)
    Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).cast(LongType).as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(col("c").cast(dec) * col("c")).cast(LongType).as("n_join"),
        max(col("c")).cast(LongType).as("max_key"))
  }

  /** q_referential_orphans — the referential-integrity audit: for
    * each foreign-key edge of the schema, how many child rows point at
    * a missing parent? Five anti-joins (each the [[qExclusionAnti]]
    * shape: child ⋈ broadcast-or-shuffled parent keys, LeftAnti) and a
    * constant-height union. On synthetic fixtures all orphan counts
    * are zero — which is exactly what the audit must PROVE, not
    * assume; on a real lake this table is the first thing a pipeline
    * checks after ingest. */
  val qReferentialOrphans: Q = (s, d) => {
    def edge(name: String, child: DataFrame, ck: String,
             parent: DataFrame, pk: String): DataFrame = {
      val orphans = child.select(col(ck)).filter(col(ck).isNotNull)
        .join(parent.select(col(pk)), col(ck) === col(pk), "left_anti")
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("fk"), col("n_child"), col("n_orphans"))
    }
    val li = Tables.lineitem(s, d); val ord = Tables.orders(s, d)
    edge("customer.c_nationkey->nation", Tables.customer(s, d), "c_nationkey",
        Tables.nation(s, d), "n_nationkey")
      .unionAll(edge("lineitem.l_orderkey->orders", li, "l_orderkey",
        ord, "o_orderkey"))
      .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey",
        Tables.part(s, d), "p_partkey"))
      .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"))
      .unionAll(edge("orders.o_custkey->customer", ord, "o_custkey",
        Tables.customer(s, d), "c_custkey"))
      .orderBy("fk")
  }

  /** q_k_anonymity — re-identification audit over the customer
    * dimension (Sweeney 2002): group the table by its quasi-identifier
    * tuple (nation, market segment, account-balance band) and surface
    * every equivalence class smaller than k = 5 — the classes whose
    * members a linker armed with public attributes can pin to ≤ 4
    * candidates. Training corpora carry user-derived metadata; this is
    * the release gate that says WHICH attribute combinations leak,
    * not just that something does.
    *
    * The balance band is float-free: cents + 100000 (shifts the
    * −999.28 minimum positive so truncating division IS floor
    * division in both engines) div 100000 → 1..10 thousand-dollar
    * bands.
    *
    * Plan: one scan, one partial-aggregated groupBy on the QI tuple,
    * one filter — the audit costs a count(*) regardless of table
    * size, which is why it belongs in every release pipeline. */
  val qKAnonymity: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_nationkey").cast(LongType).as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
          + " + 100000) div 100000").as("bal_band"))
      .groupBy("nationkey", "mktsegment", "bal_band")
      .agg(count(lit(1)).as("k"))
      .filter(col("k") < 5)
      .orderBy("nationkey", "mktsegment", "bal_band")

  /** q_l_diversity — the companion audit to [[qKAnonymity]]
    * (Machanavajjhala et al. 2007): k-anonymity alone is defeated by a
    * HOMOGENEOUS group — if all k records share one sensitive value,
    * group size protected nothing. Per quasi-identifier group
    * (nationkey, mktsegment): row count, the number of DISTINCT
    * sensitive values (the balance band), and the l ≥ 3 verdict. Every
    * group is emitted with its verdict (not just violators): the audit
    * artifact reviewers sign off on is the full table.
    *
    * Plan: one scan, one groupBy with a distinct aggregate — Spark
    * expands count(DISTINCT) into the two-phase partial-distinct
    * aggregate, so the QI×value expansion collapses map-side. */
  val qLDiversity: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_nationkey").cast(LongType).as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
          + " + 100000) div 100000").as("bal_band"))
      .groupBy("nationkey", "mktsegment")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("bal_band")).as("l_distinct"))
      .withColumn("diverse",
        when(col("l_distinct") >= 3, 1L).otherwise(0L))
      .orderBy("nationkey", "mktsegment")

  /** q_t_closeness — the third leg of the privacy triad (Li, Li &
    * Venkatasubramanian 2007) after [[qKAnonymity]] and
    * [[qLDiversity]]: even a diverse group leaks if its sensitive
    * distribution DIFFERS from the table's — "this QI group skews
    * rich" is an inference l-diversity cannot see. Per QI group
    * (nationkey, mktsegment): Earth Mover's Distance between the
    * group's balance-band distribution and the global one, for the
    * ordered domain where EMD is the mean |ΔCDF| over bands. Emitted
    * as exact permille with the t ≤ 0.2 verdict.
    *
    * Float-free: with N = table rows, n = group rows, the CDF gap at
    * band v is |cumQ_v·N − cumP_v·n| / (n·N); the numerator stays in
    * DECIMAL(38,0) (n·N ~ 1e24 at 100 TB, ×1000 < 1e38) and one
    * integral division lands the permille — bitwise-equal in both
    * engines, no float summation order to disagree on.
    *
    * Plan: the sensitive DOMAIN is bounded (≤ 12 bands by
    * construction), so the dense group×band frame is |groups|×12, the
    * global CDF is a ≤ 12-row broadcast, and the per-group CDF window
    * partitions by QI group — nothing funnels the corpus through one
    * partition; the global-CDF window runs over ≤ 12 rows. */
  val qTCloseness: Q = (s, d) => {
    val base = Tables.customer(s, d)
      .select(col("c_nationkey").cast(LongType).as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
          + " + 100000) div 100000").as("bal_band"))
    val glob = base.groupBy("bal_band").agg(count(lit(1)).as("c_v"))
      .localCheckpoint()
    val wCum = Window.orderBy("bal_band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val globCum = glob
      .withColumn("cum_glob", sum("c_v").over(wCum))
      .select("bal_band", "cum_glob")
    val scalars = glob.agg(sum("c_v").as("n_total"), count(lit(1)).as("m"))
    val groups = base.groupBy("nationkey", "mktsegment")
      .agg(count(lit(1)).as("n"))
    val gv = base.groupBy("nationkey", "mktsegment", "bal_band")
      .agg(count(lit(1)).as("c_gv"))
    val wg = Window.partitionBy("nationkey", "mktsegment")
      .orderBy("bal_band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups
      .crossJoin(broadcast(glob.select("bal_band")))
      .join(gv, Seq("nationkey", "mktsegment", "bal_band"), "left")
      .na.fill(0L, Seq("c_gv"))
      .withColumn("cum_g", sum("c_gv").over(wg))
      .join(broadcast(globCum), Seq("bal_band"))
      .crossJoin(broadcast(scalars))
      .groupBy("nationkey", "mktsegment", "n", "n_total", "m")
      .agg(sum(abs(expr("CAST(cum_g AS DECIMAL(38,0)) * n_total")
        - expr("CAST(cum_glob AS DECIMAL(38,0)) * n"))).as("emd_num"))
      .withColumn("emd_permille",
        expr("(emd_num * 1000) div (GREATEST(m - 1, 1) * n * n_total)")
          .cast(LongType))
      .withColumn("close",
        when(col("emd_permille") <= 200, 1L).otherwise(0L))
      .select("nationkey", "mktsegment", "n", "emd_permille", "close")
      .orderBy("nationkey", "mktsegment")
  }

  val queries: Map[String, Q] = Map(
    "q_k_anonymity" -> qKAnonymity,
    "q_l_diversity" -> qLDiversity,
    "q_t_closeness" -> qTCloseness,
    "q_join_size_proof" -> qJoinSizeProof,
    "q_referential_orphans" -> qReferentialOrphans,
    "q_rendezvous_shards" -> qRendezvousShards,
    "q_skyline" -> qSkyline,
    "q_salted_agg" -> qSaltedAgg,
    "q_histogram" -> qHistogram,
    "q_posexplode" -> qPosexplode,
    "q_first_last" -> qFirstLast,
    "q_covariance" -> qCovariance,
    "q_multiset_ops" -> qMultisetOps,
    "q_gap_fill" -> qGapFill,
    "q_trailing_window" -> qTrailingWindow,
    "q_regex_extract" -> qRegexExtract,
    "q_range_join" -> qRangeJoin,
    "q_tf_topk" -> qTfTopk,
    "q_doc_freq" -> qDocFreq,
    "q_grouping_sets" -> qGroupingSets,
    "q_moving_window" -> qMovingWindow,
    "q_filtered_agg" -> qFilteredAgg,
    "q_top_revenue_orders" -> qTopRevenueOrders,
    "q_most_common" -> qMostCommon,
    "q_correlated_scalar" -> qCorrelatedScalar,
    "q_date_buckets" -> qDateBuckets,
    "q_array_hof" -> qArrayHof)

  val oracle: Map[String, String] = Map(
    "q_k_anonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  c_mktsegment AS mktsegment,
        |  (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |     + 100000) // 100000 AS bal_band,
        |  COUNT(*) AS k
        |FROM customer
        |GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
        |ORDER BY nationkey, mktsegment, bal_band""".stripMargin,
    "q_t_closeness" ->
      """WITH b AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |    c_mktsegment AS mktsegment,
        |    (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |       + 100000) // 100000 AS bal_band
        |  FROM customer),
        |gdist AS (SELECT bal_band, COUNT(*) AS c_v FROM b GROUP BY 1),
        |globcum AS (
        |  SELECT bal_band, SUM(c_v) OVER (ORDER BY bal_band
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_glob
        |  FROM gdist),
        |scalars AS (SELECT SUM(c_v) AS n_total, COUNT(*) AS m FROM gdist),
        |grp AS (SELECT nationkey, mktsegment, COUNT(*) AS n
        |  FROM b GROUP BY 1, 2),
        |gv AS (SELECT nationkey, mktsegment, bal_band, COUNT(*) AS c_gv
        |  FROM b GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT g.nationkey, g.mktsegment, g.n, d.bal_band,
        |    SUM(COALESCE(v.c_gv, 0)) OVER (
        |      PARTITION BY g.nationkey, g.mktsegment ORDER BY d.bal_band
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g
        |  FROM grp g CROSS JOIN (SELECT bal_band FROM gdist) d
        |  LEFT JOIN gv v ON v.nationkey = g.nationkey
        |    AND v.mktsegment = g.mktsegment AND v.bal_band = d.bal_band),
        |num AS (
        |  SELECT c.nationkey, c.mktsegment, c.n, s.n_total, s.m,
        |    SUM(ABS(CAST(c.cum_g AS HUGEINT) * s.n_total
        |      - CAST(gc.cum_glob AS HUGEINT) * c.n)) AS emd_num
        |  FROM cum c JOIN globcum gc USING (bal_band) CROSS JOIN scalars s
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT nationkey, mktsegment, n,
        |  CAST((emd_num * 1000) // (GREATEST(m - 1, 1) * n * n_total)
        |    AS BIGINT) AS emd_permille,
        |  CAST(CASE WHEN (emd_num * 1000)
        |      // (GREATEST(m - 1, 1) * n * n_total) <= 200
        |    THEN 1 ELSE 0 END AS BIGINT) AS close
        |FROM num
        |ORDER BY nationkey, mktsegment""".stripMargin,
    "q_l_diversity" ->
      """WITH b AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |    c_mktsegment AS mktsegment,
        |    (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |       + 100000) // 100000 AS bal_band
        |  FROM customer)
        |SELECT nationkey, mktsegment, COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS l_distinct,
        |  CAST(CASE WHEN COUNT(DISTINCT bal_band) >= 3 THEN 1 ELSE 0 END
        |    AS BIGINT) AS diverse
        |FROM b GROUP BY 1, 2
        |ORDER BY nationkey, mktsegment""".stripMargin,
    "q_join_size_proof" ->
      // the ACTUAL row self-join on purpose: COUNT(*) of it equals the
      // engine's histogram sum-of-squares, proving the estimator exact
      """SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_rows,
        |  (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
        |    AS n_keys,
        |  (SELECT CAST(COUNT(*) AS BIGINT)
        |   FROM events a JOIN events b ON a.user_id = b.user_id) AS n_join,
        |  (SELECT CAST(MAX(c) AS BIGINT) FROM (
        |     SELECT COUNT(*) AS c FROM events GROUP BY user_id)) AS max_key""".stripMargin,
    "q_referential_orphans" ->
      """WITH e AS (
        |  SELECT 'customer.c_nationkey->nation' AS fk,
        |    (SELECT COUNT(*) FROM customer) AS n_child,
        |    (SELECT COUNT(*) FROM customer WHERE c_nationkey IS NOT NULL
        |       AND c_nationkey NOT IN (SELECT n_nationkey FROM nation))
        |      AS n_orphans
        |  UNION ALL SELECT 'lineitem.l_orderkey->orders',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL
        |       AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |  UNION ALL SELECT 'lineitem.l_partkey->part',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NOT NULL
        |       AND l_partkey NOT IN (SELECT p_partkey FROM part))
        |  UNION ALL SELECT 'lineitem.l_suppkey->supplier',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NOT NULL
        |       AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
        |  UNION ALL SELECT 'orders.o_custkey->customer',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL
        |       AND o_custkey NOT IN (SELECT c_custkey FROM customer)))
        |SELECT fk, CAST(n_child AS BIGINT) AS n_child,
        |  CAST(n_orphans AS BIGINT) AS n_orphans
        |FROM e ORDER BY fk""".stripMargin,
    "q_rendezvous_shards" ->
      """WITH a8 AS (
        |  SELECT doc_id, i AS shard FROM (
        |    SELECT doc_id, i,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, i) AS rn
        |    FROM (
        |      SELECT doc_id, i,
        |        CAST('0x' || substr(md5('hrw|' || CAST(i AS VARCHAR) || '|' ||
        |          CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS w
        |      FROM documents CROSS JOIN (SELECT unnest(range(0, 8)) AS i)))
        |  WHERE rn = 1),
        |a9 AS (
        |  SELECT doc_id, i AS shard9 FROM (
        |    SELECT doc_id, i,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, i) AS rn
        |    FROM (
        |      SELECT doc_id, i,
        |        CAST('0x' || substr(md5('hrw|' || CAST(i AS VARCHAR) || '|' ||
        |          CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS w
        |      FROM documents CROSS JOIN (SELECT unnest(range(0, 9)) AS i)))
        |  WHERE rn = 1)
        |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN shard9 <> shard THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_moved,
        |  CAST(SUM(CASE WHEN shard9 <> shard AND shard9 <> 8 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved_elsewhere,
        |  CAST((SUM(CASE WHEN shard9 <> shard THEN 1 ELSE 0 END) * 1000)
        |    // COUNT(*) AS BIGINT) AS moved_permille
        |FROM a8 JOIN a9 USING (doc_id)
        |GROUP BY shard ORDER BY shard""".stripMargin,
    "q_skyline" ->
      """WITH w AS (
        |  SELECT o_orderkey, o_totalprice, o_orderdate,
        |    MIN(o_orderdate) OVER (ORDER BY o_totalprice DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS min_d,
        |    MAX(o_totalprice) OVER (ORDER BY o_orderdate ASC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_p
        |  FROM orders)
        |SELECT o_orderkey, o_totalprice, o_orderdate
        |FROM w WHERE NOT (min_d < o_orderdate) AND NOT (max_p > o_totalprice)
        |ORDER BY o_orderkey""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_suppkey,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS revenue_cents,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_histogram" ->
      """SELECT cents // 5000000 AS bucket, COUNT(*) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |      FROM orders)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS word
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |      WHERE text IS NOT NULL),
        |     LATERAL (SELECT unnest(range(1, least(len(w), 5) + 1)) AS i)
        |ORDER BY doc_id, pos""".stripMargin,
    "q_first_last" ->
      """SELECT o_custkey, first_cents, second_cents FROM (
        |  SELECT o_custkey,
        |    CAST(first_value(cents) OVER w AS BIGINT) AS first_cents,
        |    CAST(nth_value(cents, 2) OVER w AS BIGINT) AS second_cents,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS rn
        |  FROM (SELECT o_custkey, o_orderkey,
        |          epoch_ms(o_orderdate) // 1000 AS d,
        |          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |        FROM orders)
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_covariance" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(COUNT(*) * SUM(qd * cd) - SUM(qd) * SUM(cd) AS BIGINT) AS cov_n2
        |FROM (SELECT l_returnflag, CAST(floor(l_quantity) AS BIGINT) AS qd,
        |             CAST(floor(l_extendedprice) AS BIGINT) AS cd
        |      FROM lineitem WHERE l_orderkey % 7 = 0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_multiset_ops" ->
      """SELECT op, k, COUNT(*) AS n FROM (
        |  SELECT 'ia' AS op, k FROM (
        |    SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000
        |    INTERSECT ALL
        |    SELECT s_nationkey AS k FROM supplier)
        |  UNION ALL
        |  SELECT 'ea' AS op, k FROM (
        |    SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000
        |    EXCEPT ALL
        |    SELECT s_nationkey AS k FROM supplier))
        |GROUP BY op, k ORDER BY op, k""".stripMargin,
    "q_gap_fill" ->
      """WITH months AS (
        |  SELECT CAST(1992 + i // 12 AS BIGINT) AS y,
        |         CAST(i % 12 + 1 AS BIGINT) AS m
        |  FROM range(0, 84) t(i)),
        |counts AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
        |         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
        |         COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT CAST(y * 100 + m AS BIGINT) AS yyyymm,
        |       CAST(COALESCE(n, 0) AS BIGINT) AS n_orders
        |FROM months LEFT JOIN counts USING (y, m)
        |ORDER BY yyyymm""".stripMargin,
    "q_trailing_window" ->
      """SELECT o_custkey, o_orderkey, d,
        |  CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY d
        |        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_cents
        |FROM (SELECT o_custkey, o_orderkey,
        |        epoch_ms(o_orderdate) // 86400000 AS d,
        |        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |      FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_regex_extract" ->
      """SELECT doc_id, long_word FROM (
        |  SELECT doc_id, regexp_extract(lower(text), '([a-z]{7,})', 1) AS long_word
        |  FROM documents)
        |WHERE length(long_word) > 0
        |ORDER BY doc_id""".stripMargin,
    "q_range_join" ->
      """WITH points AS (
        |  SELECT o_orderkey AS point_key, epoch_ms(o_orderdate) // 1000 AS p_s
        |  FROM orders WHERE o_orderkey % 127 = 0
        |), intervals AS (
        |  SELECT CAST(l_orderkey * 100 + l_linenumber AS BIGINT) AS iv_id,
        |         epoch_ms(l_shipdate) // 1000 AS lo_s,
        |         epoch_ms(l_shipdate) // 1000
        |           + CAST(floor(l_quantity) AS BIGINT) * 86400 AS hi_s
        |  FROM lineitem WHERE l_orderkey % 89 = 0
        |)
        |SELECT point_key, iv_id, p_s, lo_s, hi_s
        |FROM points p JOIN intervals i ON p.p_s BETWEEN i.lo_s AND i.hi_s
        |ORDER BY point_key, iv_id, lo_s, hi_s""".stripMargin,
    "q_tf_topk" ->
      """SELECT doc_id, word, tf, rnk FROM (
        |  SELECT doc_id, word, tf,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, word) AS BIGINT) AS rnk
        |  FROM (SELECT doc_id, word, COUNT(*) AS tf
        |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |              FROM documents)
        |        WHERE length(word) > 0 GROUP BY 1, 2))
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q_doc_freq" ->
      """SELECT word, df FROM (
        |  SELECT word, COUNT(DISTINCT doc_id) AS df
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE length(word) > 0 GROUP BY word)
        |WHERE df * 20 >= (SELECT COUNT(*) FROM documents)
        |ORDER BY df DESC, word""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_moving_window" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(cents) OVER w AS BIGINT) AS mov_cents,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_win
        |FROM (SELECT o_orderkey, o_custkey, o_orderdate,
        |        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_filtered_agg" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |         FILTER (WHERE l_discount < 0.03) AS DECIMAL(18,2)) * 100 AS BIGINT) AS lowdisc_cents
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_top_revenue_orders" ->
      """SELECT o_orderkey, o_orderpriority, revenue_e4 FROM (
        |  SELECT l_orderkey,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS revenue_e4
        |  FROM lineitem GROUP BY l_orderkey) r
        |JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY revenue_e4 DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_most_common" ->
      """SELECT o_orderstatus, mode_priority, n FROM (
        |  SELECT o_orderstatus, o_orderpriority AS mode_priority, n,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY n DESC, o_orderpriority) AS rn
        |  FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |        FROM orders GROUP BY 1, 2))
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "q_correlated_scalar" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |FROM orders o
        |WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        |       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_date_buckets" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
        |          + EXTRACT(month FROM o_orderdate) AS BIGINT) AS yyyymm,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY 1 ORDER BY yyyymm""".stripMargin,
    "q_array_hof" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  CAST(list_sum(list_transform(embedding, x ->
        |      CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(12,8)) * 100000000 AS BIGINT)
        |    * CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(12,8)) * 100000000 AS BIGINT)
        |  )) AS BIGINT) AS ssq_e16
        |FROM embeddings ORDER BY vec_id""".stripMargin)
}
