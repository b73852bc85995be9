package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.Exprs._

/** Distributed GLOBAL ranking — the scale-correct form of
  * `row_number() OVER (ORDER BY ...)`.
  *
  * Spark plans an un-partitioned (or low-cardinality-partitioned)
  * window by moving every row of the input into ONE task
  * (`Exchange SinglePartition` under the Window). Fine at 60k rows,
  * fatal at 100 TB. The scalable plan is the classic two-phase rank:
  *
  *   1. `repartitionByRange` on the sort key — a range exchange whose
  *      sampled boundaries give each of P tasks a contiguous,
  *      roughly-equal slice of the total order;
  *   2. a per-partition local `row_number` (window partitioned by
  *      `spark_partition_id()` — every partition ranks in parallel);
  *   3. a P-row offset table (count per partition, prefix-summed) is
  *      broadcast back, and `global rn = offset + local rn`.
  *
  * Everything stays in DataFrame/codegen space — no RDD hop, no
  * collect. The result is exactly the single-window answer as long as
  * the ordering is TOTAL (unique tiebreaker), which the house oracle
  * rules require anyway: rank is then a pure function of the row, so
  * partition boundaries cannot change it.
  */
object Ranking {

  type Q = (SparkSession, String) => DataFrame

  /** Append a global `row_number`-style column named `out`, ordered by
    * `orderCols` (must be a total order for a well-defined result).
    *
    * The local rank is NOT a window partitioned by partition-id — that
    * would make EnsureRequirements insert a second full-data
    * `Exchange hashpartitioning(pid)` on top of the range exchange
    * (RangePartitioning does not satisfy a clustered-on-pid
    * requirement, even though pid groups are colocated by
    * construction). Instead `monotonically_increasing_id()` above the
    * partition-local sort encodes (partitionId << 33 | rowIndex)
    * directly: pid and local rank fall out with two bit ops, zero
    * extra shuffles, and the offsets join is broadcast. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column], out: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // the data branch and the offsets branch below MUST see the same
    // physical range partitioning: RangePartitioner's sample seed
    // derives from the RDD id, so two independently-planned exchanges
    // can pick different boundaries and the offset table would
    // describe the wrong partitions. With exchange reuse on (the
    // default) both branches sit in one plan tree and dedup to a
    // single exchange; if an operator-hostile config disabled it,
    // pin the partitioning by persisting the ranged child instead.
    val reuseOn = spark.conf.get("spark.sql.exchange.reuse", "true").toBoolean
    val ranged0 = df.repartitionByRange(parts, orderCols: _*)
    val ranged =
      if (reuseOn) ranged0
      // eager localCheckpoint pins the sampled range boundaries: both
      // branches read the materialized blocks, which free on GC
      else ranged0.localCheckpoint()
    val local = ranged.sortWithinPartitions(orderCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33))
      .withColumn("__lrn", (col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1L))
      .drop("__mid")
    // P rows total: the only un-partitioned window in the plan runs
    // over the per-partition counts, not the data; the counts branch
    // shares the range exchange and needs no sort
    val offsets = ranged
      .groupBy(spark_partition_id().cast(LongType).as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, (col("__off") + col("__lrn")).cast(LongType))
      .drop("__pid", "__lrn", "__off")
  }

  /** Global `dense_rank() OVER (ORDER BY orderCols)` without a
    * single-partition window AND without the distinct-then-join-back
    * detour (rank the distinct keys via [[globalRowNumber]], join
    * back = 3 shuffles): ONE range exchange, a per-physical-partition
    * local dense_rank (the window partitions on partition id — as
    * parallel as the exchange), and a P-row offsets frame that
    * stitches partition boundaries — subtracting one whenever a
    * partition's first key equals its predecessor's last key, so a key
    * run that straddles the boundary keeps a single rank. Built for
    * iterated rankers ([[graft.operators.CorpusOps.qSuffixRanks]]'
    * prefix-doubling runs it ⌈log₂ maxdoclen⌉ times, where the
    * join-back form priced 3 shuffles per round). Row-preserving:
    * returns `df` plus the `out` column. */
  def globalDenseRank(df: DataFrame, orderCols: Seq[Column], out: String = "dr"): DataFrame =
    globalDenseRankManaged(df, orderCols, out, None, None)._1

  /** [[globalDenseRank]] with caller-managed materialization: also
    * returns the internal checkpointed frame so ITERATED callers
    * ([[graft.operators.CorpusOps]]' prefix-doubling rounds) can
    * unpersist round N−1 once round N is materialized — without this,
    * every round's frame stays persisted for the query's lifetime and
    * the rounds evict each other from the MemoryStore at scale
    * (VERDICT-r16 #3, guide §5). `numParts` overrides the range-
    * exchange fan-out (scale-adaptive callers size it from data);
    * `storage` overrides the checkpoint storage level (DISK_ONLY keeps
    * bulky inter-round frames out of execution memory's way). */
  def globalDenseRankManaged(
      df: DataFrame, orderCols: Seq[Column], out: String,
      numParts: Option[Int],
      storage: Option[org.apache.spark.storage.StorageLevel])
      : (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val parts = numParts.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val ranged = df.repartitionByRange(parts, orderCols: _*)
    val wLoc = Window.partitionBy("__pid").orderBy(orderCols: _*)
    // localCheckpoint UNCONDITIONALLY, unlike globalRowNumber's
    // reuse-reliant fast path: the offsets branch below joins back
    // onto this frame, and the join's attribute dedup RE-ALIASES one
    // subtree — the two range exchanges then canonicalize differently,
    // ReuseExchange never fires, and each samples its OWN boundaries
    // (observed live: rangepartitioning(k#10) vs (k#49) in one plan —
    // silently inconsistent pid/ldr vs offsets). Materializing pins
    // one sampling, and both consumers read the same blocks instead
    // of recomputing the sort+window.
    //
    // The persisted row is kept NARROW (r17): the boundary-key struct
    // is built in the offsets aggregation below from the persisted
    // source columns (orderCols are deterministic, so re-evaluating
    // them post-checkpoint is value-identical), and __mid drops before
    // the checkpoint — for a 16-long key that halves the bytes every
    // prefix-doubling round must hold.
    val pre = ranged.sortWithinPartitions(orderCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33))
      .withColumn("__lrn", col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1L)
      .withColumn("__ldr", dense_rank().over(wLoc).cast(LongType))
      .drop("__mid")
    val local = storage match {
      case Some(lvl) => pre.localCheckpoint(true, lvl)
      case None => pre.localCheckpoint()
    }
    // P rows: per-partition group count + boundary keys; the only
    // un-partitioned windows below run over these P rows
    val wOrd = Window.orderBy("__pid")
    val offsets = local.groupBy(col("__pid"))
      .agg(max(col("__ldr")).as("__ng"),
        min_by(struct(orderCols: _*), col("__lrn")).as("__first"),
        max_by(struct(orderCols: _*), col("__lrn")).as("__last"))
      .withColumn("__merge",
        when(col("__first") === lag(col("__last"), 1).over(wOrd), 1L)
          .otherwise(0L))
      .withColumn("__cumng", coalesce(
        sum(col("__ng")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__cummerge",
        sum(col("__merge")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("__pid"), (col("__cumng") - col("__cummerge")).as("__off"))
    val ranked = local.join(broadcast(offsets), "__pid")
      .withColumn(out, (col("__off") + col("__ldr")).cast(LongType))
      .drop("__pid", "__lrn", "__ldr", "__off")
    (ranked, local)
  }

  /** Per-group `row_number() OVER (PARTITION BY keys ORDER BY ...)`
    * without a per-key window — the scale-correct form when the
    * partition key has FEW distinct values (a plain window then
    * funnels the whole table through as many tasks as there are keys;
    * 5 priorities at 100 TB = 5 tasks). For genuinely high-cardinality
    * keys the plain window is already parallel — use it instead; this
    * operator broadcasts one row per group.
    *
    * Shape: one global rank over the total order (keys ++ orderCols)
    * — groups are contiguous in it, keys ascending-nulls-first — then
    * subtract each group's first global rank, computed WITHOUT a
    * second pass over the ranked data: group-min rank = 1 + prefix
    * sum of prior groups' row counts (a hash agg straight off the
    * input and a window over one tiny row per group, the same trick
    * as [[globalRowNumber]]'s offset table). The join back is
    * null-safe (`<=>`), so a NULL group keeps its ranks exactly like
    * the window form. Keys are column NAMES: the group-count branch
    * and the rank branch must agree on the key expressions, which
    * names guarantee and arbitrary expressions would not. */
  def groupedRowNumber(
      df: DataFrame, partitionCols: Seq[String], orderCols: Seq[Column],
      out: String = "rn"): DataFrame = {
    val keys = partitionCols.map(col)
    val ranked = globalRowNumber(df, keys ++ orderCols, "__grn")
    val wPrev = Window
      .orderBy(partitionCols.map(c => col(c).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val mins = df.groupBy(keys: _*).agg(count(lit(1)).as("__gcnt"))
      .withColumn("__gmin",
        coalesce(sum(col("__gcnt")).over(wPrev), lit(0L)) + 1L)
      .select(
        partitionCols.map(c => col(c).as(s"__k_$c")) :+ col("__gmin"): _*)
    val cond = partitionCols
      .map(c => ranked(c) <=> mins(s"__k_$c")).reduce(_ && _)
    ranked.join(broadcast(mins), cond)
      .withColumn(out, (col("__grn") - col("__gmin") + 1L).cast(LongType))
      .drop(Seq("__grn", "__gmin") ++ partitionCols.map(c => s"__k_$c"): _*)
  }

  /** SQL-standard NTILE from a global row number: the first `n % k`
    * buckets take `n/k + 1` rows, the rest `n/k` — pure integer
    * arithmetic on (rn, n), no second window. Division is Catalyst
    * IntegralDivide (the Column `/` operator is DOUBLE division, whose
    * 53-bit mantissa could misplace a bucket boundary on the >2^52-row
    * inputs this operator exists for). */
  def ntileFromRn(rn: Column, n: Column, k: Int): Column = {
    def idiv(a: Column, b: Column): Column =
      org.apache.spark.sql.GraftSqlBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftSqlBridge.expression(a.cast(LongType)),
          org.apache.spark.sql.GraftSqlBridge.expression(b.cast(LongType)),
          evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
    val q = idiv(n, lit(k))
    val rem = (n % k).cast(LongType)
    val cut = rem * (q + 1) // rows in the first rem (larger) buckets
    when(rn <= cut, idiv(rn - 1, q + 1))
      .otherwise(rem + idiv(rn - 1 - cut, q))
      .cast(LongType) + 1
  }

  /** Global ranking of every order by total price without any
    * single-partition window: distributed rank + arithmetic octile.
    * The oracle runs the plain `row_number()/ntile(8) OVER (ORDER BY
    * ...)` — same answer, diametrically different plan shape. */
  val qGlobalRank: Q = (s, d) => {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), intScaled(dec2(col("o_totalprice")), 100L).as("cents"))
    val nRows = base.agg(count(lit(1)).as("__n"))
    globalRowNumber(base, Seq(col("cents"), col("o_orderkey")), "rn")
      .crossJoin(broadcast(nRows))
      .withColumn("octile", ntileFromRn(col("rn"), col("__n"), 8))
      .drop("__n")
      .orderBy("rn")
  }

  /** Per-priority order ranking through [[groupedRowNumber]] — the
    * low-cardinality-partition case (5 priorities) where the plain
    * window would run on 5 tasks; the oracle IS that plain window. */
  val qGroupedRank: Q = (s, d) =>
    groupedRowNumber(
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          intScaled(dec2(col("o_totalprice")), 100L).as("cents")),
      Seq("o_orderpriority"),
      Seq(col("cents"), col("o_orderkey")))
      .orderBy("o_orderpriority", "rn")

  /** Per-group top-k through the native bounded-heap aggregate
    * ([[graft.functions.TopKLongsAgg]], SQL name `top_k`): per return
    * flag, the 5 largest lineitem prices. The oracle runs the window
    * form (`row_number ... <= 5`), which must SORT every row of every
    * group; the aggregate's partial phase truncates to k values
    * map-side, so the shuffle carries ≤ k longs per partition per
    * group — the same answer from a plan that never sorts the table.
    * Multiset semantics (values only, ties collapse) keep the result
    * deterministic under any input order. */
  val qTopkAgg: Q = (s, d) => {
    import org.apache.spark.sql.GraftSqlBridge
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        intScaled(dec2(col("l_extendedprice")), 100L).as("cents"))
    val topk = GraftSqlBridge.column(
      graft.functions.TopKLongsAgg(
        GraftSqlBridge.expression(col("cents")),
        org.apache.spark.sql.catalyst.expressions.Literal(5))
        .toAggregateExpression())
    li.groupBy("l_returnflag").agg(topk.as("topv"))
      .select(col("l_returnflag"), posexplode(col("topv")).as(Seq("p", "cents")))
      .select(col("l_returnflag"), (col("p") + 1).cast(LongType).as("rnk"), col("cents"))
      .orderBy("l_returnflag", "rnk")
  }

  /** The heavy-hitters sketch proven EXACT through the oracle gate:
    * `freq_items` over l_linenumber (7 distinct values) with a 64-slot
    * map never evicts, so every estimate is the true count (lb == ub)
    * and the result is sharding-independent — the oracle is the plain
    * GROUP BY count. Same pattern as q_salted_agg: the scale machinery
    * verified in the regime where an exact twin exists, spec-covered
    * in the approximate regime beyond it (FreqItemsSpec). */
  val qFreqExact: Q = (s, d) => {
    import org.apache.spark.sql.GraftSqlBridge
    val fi = GraftSqlBridge.column(
      graft.functions.FreqItemsAgg(
        GraftSqlBridge.expression(col("v")),
        org.apache.spark.sql.catalyst.expressions.Literal(64))
        .toAggregateExpression())
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linenumber").cast(LongType).as("v"))
      .groupBy("l_returnflag").agg(fi.as("fi"))
      .select(col("l_returnflag"), explode(col("fi")).as("r"))
      .select(col("l_returnflag"), col("r.item").as("item"), col("r.estimate").as("n"))
      .orderBy(col("l_returnflag"), col("n").desc, col("item"))
  }

  val queries: Map[String, Q] = Map(
    "q_global_rank" -> qGlobalRank,
    "q_grouped_rank" -> qGroupedRank,
    "q_topk_agg" -> qTopkAgg,
    "q_freq_exact" -> qFreqExact)

  val oracle: Map[String, String] = Map(
    "q_global_rank" ->
      """SELECT o_orderkey, cents,
        |  CAST(row_number() OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
        |  CAST(ntile(8) OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS octile
        |FROM (SELECT o_orderkey,
        |        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |      FROM orders)
        |ORDER BY rn""".stripMargin,
    "q_grouped_rank" ->
      """SELECT o_orderkey, o_orderpriority, cents,
        |  CAST(row_number() OVER (PARTITION BY o_orderpriority
        |       ORDER BY cents, o_orderkey) AS BIGINT) AS rn
        |FROM (SELECT o_orderkey, o_orderpriority,
        |        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |      FROM orders)
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q_topk_agg" ->
      """SELECT l_returnflag, CAST(rn AS BIGINT) AS rnk, cents
        |FROM (SELECT l_returnflag, cents,
        |        row_number() OVER (PARTITION BY l_returnflag
        |                           ORDER BY cents DESC) AS rn
        |      FROM (SELECT l_returnflag,
        |              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |            FROM lineitem))
        |WHERE rn <= 5 ORDER BY l_returnflag, rnk""".stripMargin,
    "q_freq_exact" ->
      """SELECT l_returnflag, CAST(l_linenumber AS BIGINT) AS item, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linenumber
        |ORDER BY l_returnflag, n DESC, item""".stripMargin)
}
