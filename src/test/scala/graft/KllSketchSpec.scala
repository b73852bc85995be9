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
    // plain fractional literals (DECIMAL) must coerce to DOUBLE rank
    val got = spark.sql(
      """SELECT kll_quantile(s, 0.5) AS p50, kll_quantile(s, 0.95) AS p95
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

  test("argument hygiene: out-of-range kll rank and wrapped freq_items size rejected") {
    Graft.install(spark)
    Seq(1.0, 2.0).toDF("v").createOrReplaceTempView("kll_rank")
    val e = intercept[Exception] {
      spark.sql("SELECT kll_quantile(kll_sketch_bytes(v), 1.5) FROM kll_rank").collect()
    }
    def hasMsg(t: Throwable, m: String): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains(m)) || hasMsg(t.getCause, m))
    assert(hasMsg(e, "rank must be in [0, 1]"))
    // a BIGINT map size >= 2^32 must not wrap into a small accepted value
    Seq(1L, 2L).toDF("v").createOrReplaceTempView("fi_wrap")
    val e2 = intercept[Exception] {
      spark.sql("SELECT freq_items(v, 4294967360) FROM fi_wrap").collect()
    }
    assert(hasMsg(e2, "power of 2 in [8, 2^26]"))
  }
}
