package graft

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

import graft.plans.{Graft, RangeJoinExec}

/** The BETWEEN-join optimizer rewrite: plain SQL picks up the custom
  * range-join plan, guarded against equi-joins, big interval sides,
  * strict inequalities, and hinted joins; leftover conjuncts survive
  * as a Filter with identical results.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  private lazy val installed: Unit = {
    Graft.install(spark)
    import spark.implicits._
    (1L to 200L).map(i => (i, i % 53)).toDF("pid", "ts")
      .createOrReplaceTempView("points_v")
    Seq((1L, 5L, 15L, "a"), (2L, 10L, 20L, "b"), (3L, 40L, 60L, "c"))
      .toDF("iid", "lo", "hi", "tag")
      .createOrReplaceTempView("iv_v")
  }

  private def planOf(sql: String) = {
    installed
    spark.sql(sql).queryExecution.executedPlan
  }

  test("SQL BETWEEN join plans through RangeJoinExec with identical results") {
    installed
    val q =
      """SELECT pid, iid FROM points_v p JOIN iv_v i
        |ON p.ts BETWEEN i.lo AND i.hi""".stripMargin
    val plan = planOf(q)
    assert(plan.collect { case e: RangeJoinExec => e }.nonEmpty, plan.toString)
    assert(plan.collect { case e: BroadcastNestedLoopJoinExec => e }.isEmpty)
    // reference answer computed directly from the fixture definitions
    import spark.implicits._
    val intervals = Seq((1L, 5L, 15L), (2L, 10L, 20L), (3L, 40L, 60L))
    val want = (for {
      pid <- 1L to 200L
      ts = pid % 53
      (iid, lo, hi) <- intervals
      if ts >= lo && ts <= hi
    } yield (pid, iid)).toSet
    val got = spark.sql(q).as[(Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("explicit >= / <= conjuncts in either orientation also rewrite") {
    val plan = planOf(
      """SELECT pid, iid FROM points_v p JOIN iv_v i
        |ON i.lo <= p.ts AND i.hi >= p.ts""".stripMargin)
    assert(plan.collect { case e: RangeJoinExec => e }.nonEmpty, plan.toString)
  }

  test("extra conjuncts become a Filter above the range join, rows unchanged") {
    installed
    val q =
      """SELECT pid, iid FROM points_v p JOIN iv_v i
        |ON p.ts BETWEEN i.lo AND i.hi AND i.tag <> 'b'""".stripMargin
    val plan = planOf(q)
    assert(plan.collect { case e: RangeJoinExec => e }.nonEmpty, plan.toString)
    import spark.implicits._
    val got = spark.sql(q).as[(Long, Long)].collect().toSet
    assert(got.nonEmpty && !got.exists(_._2 == 2L))
  }

  test("equi-join conjunct suppresses the rewrite (hash join is the better plan)") {
    val plan = planOf(
      """SELECT pid, i.iid FROM points_v p JOIN iv_v i
        |ON p.pid = i.iid AND p.ts BETWEEN i.lo AND i.hi""".stripMargin)
    assert(plan.collect { case e: RangeJoinExec => e }.isEmpty, plan.toString)
  }

  test("null-safe equi conjunct (<=>) also suppresses the rewrite") {
    val plan = planOf(
      """SELECT pid, i.iid FROM points_v p JOIN iv_v i
        |ON p.pid <=> i.iid AND p.ts BETWEEN i.lo AND i.hi""".stripMargin)
    assert(plan.collect { case e: RangeJoinExec => e }.isEmpty, plan.toString)
  }

  test("strict inequalities do not rewrite (exec is closed-interval)") {
    val plan = planOf(
      """SELECT pid, iid FROM points_v p JOIN iv_v i
        |ON p.ts > i.lo AND p.ts < i.hi""".stripMargin)
    assert(plan.collect { case e: RangeJoinExec => e }.isEmpty, plan.toString)
  }

  test("oversized interval side is not rewritten (broadcast gate)") {
    installed
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = spark.sql(
        """SELECT pid, iid FROM points_v p JOIN iv_v i
          |ON p.ts BETWEEN i.lo AND i.hi""".stripMargin)
        .queryExecution.executedPlan
      assert(plan.collect { case e: RangeJoinExec => e }.isEmpty, plan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
