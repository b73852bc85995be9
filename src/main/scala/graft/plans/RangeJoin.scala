package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Interval-containment range join as a first-class plan: the full
  * custom-operator path — logical node → planner strategy → physical
  * operator — registered through `SparkSessionExtensions`
  * ([[GraftExtensions]]) or onto a live session
  * ([[Graft.install]]).
  *
  * Semantics: inner join of a (large) point-side row `p` against every
  * (small) interval-side row `[lo, hi]` with `lo <= p AND p <= he`
  * (closed interval — SQL `BETWEEN`). The reference engine expresses
  * this as a plain non-equi join; Catalyst can only plan a bare
  * range predicate as `BroadcastNestedLoopJoin`, which evaluates the
  * predicate on every (point × interval) pair — O(n·m) comparisons.
  * [[RangeJoinExec]] instead sorts the broadcast intervals by `lo`
  * once and answers each point with a binary search plus a
  * prefix-max-bounded walk — O((n+m)·log m) total, the classic
  * stabbing-query plan a native engine would pick.
  *
  * Scale shape: the interval side is broadcast (like any broadcast
  * join, it must fit on executors — guarded at
  * [[RangeJoinExec.MaxBroadcastIntervals]]); the point side streams
  * partition-parallel with no shuffle and no sort, preserving its
  * partitioning. At 100 TB the point side is the fact table and the
  * interval side is a dimension (calendar windows, maintenance
  * windows, session boundaries) — exactly the broadcast contract.
  */
case class RangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    point: Expression,
    lo: Expression,
    hi: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical operator: broadcast the interval side sorted by `lo` with
  * a running prefix-max over `hi`; stream the point side.
  *
  * Per point `p`: binary-search the last interval with `lo <= p`, then
  * walk left emitting matches while `prefixMaxHi > p` — the prefix max
  * proves no earlier interval can still contain `p`, so the walk stops
  * as early as the data allows (O(log m + matches) for non-pathological
  * overlap, never worse than the candidate prefix).
  */
case class RangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    point: Expression,
    lo: Expression,
    hi: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // streaming side's distribution is untouched — no shuffle, no sort
  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val ordering = TypeUtils.getInterpretedOrdering(point.dataType)
      .asInstanceOf[Ordering[Any]]

    // Build the broadcast index once on the driver: rows sorted by lo,
    // parallel arrays of lo/hi values, prefix max over hi.
    val boundLo = BindReferences.bindReference(lo, right.output)
    val boundHi = BindReferences.bindReference(hi, right.output)
    // executeTake, not executeCollect: the cap must trip BEFORE the
    // driver materializes an oversized side, or the "guard" is just a
    // post-mortem note on the OOM
    val collected = right.executeTake(RangeJoinExec.MaxBroadcastIntervals + 1)
    require(collected.length <= RangeJoinExec.MaxBroadcastIntervals,
      s"range join interval side exceeds " +
        s"${RangeJoinExec.MaxBroadcastIntervals} rows (the broadcast " +
        "plan's cap); swap sides or pre-aggregate the intervals")
    val entries = collected.flatMap { r =>
      val l = boundLo.eval(r)
      val h = boundHi.eval(r)
      // SQL comparison semantics: a null bound never matches anything
      if (l == null || h == null) None else Some((l, h, r))
    }.sortBy(_._1)(ordering)
    val loArr = entries.map(_._1)
    val hiArr = entries.map(_._2)
    val rows = entries.map(_._3)
    val prefixMaxHi = new Array[Any](entries.length)
    var i = 0
    var runMax: Any = null
    while (i < entries.length) {
      if (runMax == null || ordering.gt(hiArr(i), runMax)) runMax = hiArr(i)
      prefixMaxHi(i) = runMax
      i += 1
    }
    val index: Broadcast[(Array[Any], Array[Any], Array[Any], Array[InternalRow])] =
      session.sparkContext.broadcast((loArr, hiArr, prefixMaxHi, rows))

    val pointExpr = point
    val leftOutput = left.output
    val allOutput = output
    left.execute().mapPartitions { iter =>
      val (los, his, prefMax, ivRows) = index.value
      val boundPoint = BindReferences.bindReference(pointExpr, leftOutput)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(allOutput, allOutput)
      iter.flatMap { leftRow =>
        val p = boundPoint.eval(leftRow)
        if (p == null || los.isEmpty) Iterator.empty
        else {
          // last index with lo <= p (exclusive upper bound of candidates)
          var a = 0
          var b = los.length
          while (a < b) {
            val mid = (a + b) >>> 1
            if (ordering.lteq(los(mid), p)) a = mid + 1 else b = mid
          }
          val from = a - 1
          new Iterator[InternalRow] {
            private var j = from
            private var nextRow: InternalRow = _
            private def advance(): Unit = {
              nextRow = null
              while (nextRow == null && j >= 0 && ordering.gteq(prefMax(j), p)) {
                if (ordering.gteq(his(j), p)) {
                  nextRow = ivRows(j)
                }
                j -= 1
              }
            }
            advance()
            override def hasNext: Boolean = nextRow != null
            override def next(): InternalRow = {
              val out = proj(joined(leftRow, nextRow))
              advance()
              out
            }
          }
        }
      }
    }
  }
}

object RangeJoinExec {
  /** Broadcast guard, same spirit as `spark.sql.autoBroadcastJoinThreshold`:
    * the interval index lives on every executor. 10M intervals ≈ a few
    * hundred MB of UnsafeRows — past that the broadcast plan is the
    * wrong plan and the caller should hear it loudly rather than OOM. */
  val MaxBroadcastIntervals: Int = 10_000_000
}

/** Plans [[RangeJoin]] into [[RangeJoinExec]]; every other node falls
  * through to the built-in strategies. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, p, lo, hi) =>
      RangeJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case _ => Nil
  }
}

/** User-facing API for the custom plans. */
object Graft {

  /** Ensure the graft strategy + SQL functions are available on a live
    * session (idempotent). Builder-time registration is
    * [[GraftExtensions]] via `spark.sql.extensions`; this covers
    * sessions the caller did not build. */
  def install(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(GraftStrategy)) {
      em.extraStrategies = em.extraStrategies :+ GraftStrategy
    }
    if (!em.extraOptimizations.contains(RangeJoinRewrite)) {
      em.extraOptimizations = em.extraOptimizations :+ RangeJoinRewrite
    }
    graft.GraftExtensions.functionDescriptors.foreach { case (id, _, builder) =>
      if (!GraftSqlBridge.hasFunction(spark, id.funcName)) {
        GraftSqlBridge.registerFunction(spark, id.funcName, builder)
      }
    }
  }

  /** Range join `points` (streamed) against `intervals` (broadcast):
    * rows where `points(pointCol) BETWEEN intervals(loCol) AND
    * intervals(hiCol)`. Column references are resolved against each
    * side's analyzed plan, so ambiguous names across sides are fine;
    * the three columns must share an orderable type. */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String): DataFrame = {
    val spark = points.sparkSession
    install(spark)
    val lp = points.queryExecution.analyzed
    // self-join hygiene: if the two sides share attribute exprIds (same
    // source relation), re-alias every right column to fresh exprIds —
    // the analyzer's DeduplicateRelations handles Join but not custom
    // nodes, and duplicate ids make the output projection bind BOTH
    // occurrences to the left side's slot (silent wrong values)
    val rightDeduped =
      if (intervals.queryExecution.analyzed.outputSet.intersect(lp.outputSet).nonEmpty)
        intervals.select(intervals.columns.map(c => intervals(c).as(c)).toSeq: _*)
      else intervals
    val rp = rightDeduped.queryExecution.analyzed
    def resolve(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"rangeJoin: no column '$name' on the $side side " +
          s"(has: ${plan.output.map(_.name).mkString(", ")})"))
    val p = resolve(lp, pointCol, "point")
    val l = resolve(rp, loCol, "interval")
    val h = resolve(rp, hiCol, "interval")
    require(p.dataType == l.dataType && p.dataType == h.dataType,
      s"rangeJoin: point/lo/hi types must match, got " +
        s"${p.dataType.simpleString}/${l.dataType.simpleString}/${h.dataType.simpleString}")
    GraftSqlBridge.ofRows(spark, RangeJoin(lp, rp, p, l, h))
  }
}
