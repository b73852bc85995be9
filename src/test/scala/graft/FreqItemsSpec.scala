package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.plans.Graft

/** The native heavy-hitters aggregate: exact sharding-independent
  * counts while the map fits, merge correctness across partitions, and
  * the error-interval contract beyond the exact regime. */
class FreqItemsSpec extends SparkSpec {

  import spark.implicits._

  test("freq_items: exact counts (lb == ub) while the map fits, any sharding") {
    Graft.install(spark)
    // 20 distinct values with known skewed counts, 64-slot map → exact
    val rows = (1 to 20).flatMap(v => Seq.fill(v * 3)(v.toLong))
    val expected = rows.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
    Seq(4, 16).foreach { parts =>
      val df = rnd(rows).toDF("v").repartition(parts, col("v") + lit(1))
      df.createOrReplaceTempView("fi_in")
      val out = spark.sql("SELECT freq_items(v, 64) AS fi FROM fi_in")
        .select(explode(col("fi")).as("r")).select("r.*")
        .as[(Long, Long, Long, Long)].collect()
      assert(out.forall { case (_, est, lb, ub) => est == lb && lb == ub })
      assert(out.map { case (item, est, _, _) => (item, est) }.toMap == expected)
      // pinned output order: estimate desc, item asc
      assert(out.sortBy { case (item, est, _, _) => (-est, item) }.toSeq == out.toSeq)
    }
  }

  test("freq_items: beyond the exact regime the interval still brackets truth") {
    Graft.install(spark)
    // one heavy item in a sea of 5000 singletons, map of only 32 slots
    val rows = Seq.fill(2000)(7L) ++ (10000L to 15000L)
    rnd(rows).toDF("v").repartition(8).createOrReplaceTempView("fi_sea")
    val out = spark.sql("SELECT freq_items(v, 32) AS fi FROM fi_sea")
      .select(explode(col("fi")).as("r")).select("r.*")
      .as[(Long, Long, Long, Long)].collect()
    val heavy = out.find(_._1 == 7L).get
    assert(heavy._3 <= 2000L && 2000L <= heavy._4) // lb <= truth <= ub
  }

  test("freq_items: maxMapSize validation is width-independent (Int and Long literals)") {
    Graft.install(spark)
    spark.range(1).createOrReplaceTempView("fi_one")
    def run(sizeLiteral: String) =
      spark.sql(s"SELECT freq_items(id, $sizeLiteral) FROM fi_one").collect()
    // in-range powers of 2 pass at both widths
    run("64"); run("CAST(64 AS BIGINT)")
    // above 2^26, below 2^31: must fail as an INT literal too (the
    // Int fall-through used to skip the upper bound)
    Seq("134217728" /* 2^27 Int */,
        "CAST(134217728 AS BIGINT)",
        s"CAST(${1L << 33} AS BIGINT)" /* would wrap if truncated */,
        "63" /* non-power-of-2 */,
        "4"  /* below lower bound */).foreach { bad =>
      val e = intercept[Exception](run(bad))
      assert(e.getMessage.contains("power of 2"), s"$bad: ${e.getMessage}")
    }
  }

  private def rnd(xs: Seq[Long]): Seq[Long] =
    new scala.util.Random(5).shuffle(xs)
}
