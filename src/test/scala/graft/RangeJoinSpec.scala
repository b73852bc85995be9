package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.{Graft, RangeJoinExec}

/** Custom range-join plan: semantics vs the equivalent non-equi join,
  * plan shape (RangeJoinExec, not BroadcastNestedLoopJoin), null/edge
  * handling, and the SparkSessionExtensions registration path.
  */
class RangeJoinSpec extends SparkSpec {

  private def referenceJoin(
      points: Seq[(Long, Long)], intervals: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, p) <- points
      (iid, lo, hi) <- intervals
      if lo <= p && p <= hi
    } yield (pid, iid)).toSet

  private def run(
      points: Seq[(Long, Long)], intervals: Seq[(Long, Long, Long)]): Set[(Long, Long)] = {
    import spark.implicits._
    val pdf = points.toDF("pid", "p")
    val idf = intervals.toDF("iid", "lo", "hi")
    Graft.rangeJoin(pdf, idf, "p", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
  }

  test("matches the all-pairs reference join on a fixed fixture") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 100L), (5L, -3L))
    val intervals = Seq(
      (10L, 0L, 10L),     // catches 5, 10, -3? no: -3 < 0
      (11L, 5L, 5L),      // degenerate single-point interval
      (12L, 8L, 20L),     // catches 10, 15
      (13L, -10L, -1L),   // catches -3
      (14L, 50L, 60L))    // catches nothing
    assert(run(points, intervals) === referenceJoin(points, intervals))
  }

  test("property: equals the all-pairs join on random interval sets") {
    val genPoints = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 1000L), Gen.choose(-50L, 150L)))
    val genIntervals = Gen.listOfN(40,
      for {
        id <- Gen.choose(0L, 1000L)
        a <- Gen.choose(-60L, 160L)
        len <- Gen.choose(0L, 40L)
      } yield (id, a, a + len))
    (0 until 8).foreach { i =>
      val ps = genPoints.apply(Gen.Parameters.default, Seed(17L + i)).get
      val ivs = genIntervals.apply(Gen.Parameters.default, Seed(91L + i)).get
      assert(run(ps, ivs) === referenceJoin(ps, ivs))
    }
  }

  test("null points and null bounds never match; empty interval side is empty") {
    import spark.implicits._
    val pdf = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "p")
    val idf = Seq((10L, Some(0L), Some(10L)), (11L, None, Some(10L)), (12L, Some(0L), None))
      .toDF("iid", "lo", "hi")
    val got = Graft.rangeJoin(pdf, idf, "p", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))

    val empty = Graft.rangeJoin(pdf, idf.filter(lit(false)), "p", "lo", "hi")
    assert(empty.count() === 0L)
  }

  test("plans as RangeJoinExec with no shuffle and no nested-loop join") {
    import spark.implicits._
    val pdf = (1L to 100L).map(i => (i, i % 37)).toDF("pid", "p")
    val idf = Seq((1L, 5L, 10L), (2L, 20L, 30L)).toDF("iid", "lo", "hi")
    val df = Graft.rangeJoin(pdf, idf, "p", "lo", "hi")
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case e: RangeJoinExec => e }.nonEmpty, plan.toString)
    assert(plan.collect { case e: BroadcastNestedLoopJoinExec => e }.isEmpty)
    assert(!plan.toString.contains("Exchange"), plan.toString)
  }

  test("point side survives projection and filtering above the join") {
    import spark.implicits._
    val pdf = (1L to 50L).map(i => (i, i)).toDF("pid", "p")
    val idf = Seq((1L, 10L, 19L), (2L, 40L, 45L)).toDF("iid", "lo", "hi")
    val got = Graft.rangeJoin(pdf, idf, "p", "lo", "hi")
      .filter(col("iid") === 1L)
      .select((col("pid") * 2).as("pp"))
      .as[Long].collect().sorted
    assert(got === (10L to 19L).map(_ * 2).toArray)
  }

  test("install works on a sibling session and is idempotent") {
    val s2 = spark.newSession()
    import s2.implicits._
    val pdf = Seq((1L, 5L)).toDF("pid", "p")
    val idf = Seq((10L, 0L, 10L)).toDF("iid", "lo", "hi")
    // rangeJoin installs onto whatever session owns its input frames
    val out = Graft.rangeJoin(pdf, idf, "p", "lo", "hi").select("pid", "iid")
      .as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 10L)))
    Graft.install(s2)
    Graft.install(s2) // second install must not duplicate strategies
    assert(s2.experimental.extraStrategies.count(_ == graft.plans.GraftStrategy) === 1)
  }

  test("SQL functions registered on live sessions by install") {
    Graft.install(spark)
    val r = spark.sql("SELECT find_extension('archive.tar.gz') AS e").collect()
    assert(r.head.getString(0) === "tar.gz")
    val d = spark.sql(
      "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(2 AS FLOAT), CAST(0.5 AS FLOAT))) AS d").collect()
    assert(d.head.getDouble(0) === 4.0)
  }

  test("self-join inputs sharing exprIds are deduplicated, right columns survive") {
    import spark.implicits._
    val t = (1L to 20L).map(i => (i, i)).toDF("id", "x")
    val points = t.select(col("id").as("pid"), col("x").as("p"))
    // same source relation → same underlying exprIds without dedup
    val intervals = t.select(col("x").as("lo"), (col("x") + 2L).as("hi"),
      col("id").as("iid"))
    val got = Graft.rangeJoin(points, intervals, "p", "lo", "hi")
      .select(col("pid"), col("iid"), col("lo"))
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      p <- 1L to 20L
      i <- 1L to 20L
      if p >= i && p <= i + 2
    } yield (p, i, i)).toSet
    assert(got === want)
  }

  test("interval-side cap trips before materializing the whole side") {
    // cap is 10M — fabricate a over-cap side cheaply via range
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val intervals = spark.range(RangeJoinExec.MaxBroadcastIntervals + 1L)
      .select(col("id").as("iid"), col("id").as("lo"), (col("id") + 1).as("hi"))
    val e = intercept[Exception] {
      Graft.rangeJoin(points, intervals, "p", "lo", "hi").count()
    }
    assert(e.getMessage.contains("exceeds"), e.getMessage)
  }

  test("any orderable type joins: dates and strings, not just longs") {
    import spark.implicits._
    val points = Seq(
      (1L, java.sql.Date.valueOf("1995-06-15")),
      (2L, java.sql.Date.valueOf("1997-01-01"))).toDF("pid", "d")
    val intervals = Seq(
      (10L, java.sql.Date.valueOf("1995-01-01"), java.sql.Date.valueOf("1995-12-31")),
      (11L, java.sql.Date.valueOf("1996-01-01"), java.sql.Date.valueOf("1996-12-31")))
      .toDF("iid", "lo", "hi")
    val got = Graft.rangeJoin(points, intervals, "d", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))

    val sPoints = Seq((1L, "banana"), (2L, "zebra")).toDF("pid", "s")
    val sIv = Seq((20L, "a", "m"), (21L, "n", "q")).toDF("iid", "lo", "hi")
    val sGot = Graft.rangeJoin(sPoints, sIv, "s", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(sGot === Set((1L, 20L)))
  }

  test("mismatched column types and missing columns fail loudly") {
    import spark.implicits._
    val pdf = Seq((1L, "x")).toDF("pid", "p")
    val idf = Seq((10L, 0L, 10L)).toDF("iid", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      Graft.rangeJoin(pdf, idf, "p", "lo", "hi")
    }
    assert(e.getMessage.contains("types must match"))
    val e2 = intercept[RuntimeException] {
      Graft.rangeJoin(pdf, idf, "nope", "lo", "hi")
    }
    assert(e2.getMessage.contains("no column 'nope'"))
  }
}
