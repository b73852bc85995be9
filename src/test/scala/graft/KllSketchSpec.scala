package graft

import org.apache.spark.sql.functions._

import graft.plans.Graft

/** The mergeable KLL quantile sketch family: rank-error band vs exact,
  * per-increment merge equivalence (the no-rescan rollup contract), and
  * empty/null behavior. */
class KllSketchSpec extends SparkSpec {

  import spark.implicits._

  test("kll quantiles land within the k=200 rank-error band of exact") {
    Graft.install(spark)
    val n = 20000
    val rows = new scala.util.Random(11).shuffle((1 to n).map(_.toDouble))
    rows.toDF("v").repartition(16).createOrReplaceTempView("kll_in")
    val got = spark.sql(
      """SELECT kll_quantile(s, 0.5d) AS p50, kll_quantile(s, 0.95d) AS p95
        |FROM (SELECT kll_sketch_bytes(v) AS s FROM kll_in)""".stripMargin)
      .as[(Double, Double)].head()
    // k=200 → ~1.7% rank error ⇒ value error ~n*0.017 on uniform ranks
    assert(math.abs(got._1 - n * 0.50) <= n * 0.02, s"p50=${got._1}")
    assert(math.abs(got._2 - n * 0.95) <= n * 0.02, s"p95=${got._2}")
  }

  test("per-increment sketches merged == one-shot sketch (no-rescan rollup)") {
    Graft.install(spark)
    val rows = new scala.util.Random(23).shuffle((1 to 10000).map(_.toDouble))
    val df = rows.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("inc", "v")
    df.createOrReplaceTempView("kll_incs")
    // one sketch per increment, then union-merged
    val merged = spark.sql(
      """SELECT kll_quantile(kll_merge_bytes(s), 0.5d) FROM
        |  (SELECT inc, kll_sketch_bytes(v) AS s FROM kll_incs GROUP BY inc)""".stripMargin)
      .as[Double].head()
    val oneShot = spark.sql("SELECT kll_quantile(kll_sketch_bytes(v), 0.5d) FROM kll_incs")
      .as[Double].head()
    // both estimates must sit in the same error band around truth
    assert(math.abs(merged - 5000) <= 300, s"merged=$merged")
    assert(math.abs(oneShot - 5000) <= 300, s"oneShot=$oneShot")
  }

  test("kll_quantile of an empty sketch is NULL, nulls are skipped") {
    Graft.install(spark)
    Seq[(Int, Option[Double])]((1, None), (1, Some(3.0)))
      .toDF("g", "v").createOrReplaceTempView("kll_null")
    val one = spark.sql(
      "SELECT kll_quantile(kll_sketch_bytes(v), 0.5d) FROM kll_null")
      .as[Option[Double]].head()
    assert(one.contains(3.0)) // null input skipped, single value is every quantile
    val empty = spark.sql(
      "SELECT kll_quantile(kll_sketch_bytes(v), 0.5d) FROM kll_null WHERE v IS NULL AND g = 2")
      .as[Option[Double]].head()
    assert(empty.isEmpty)
  }
}
