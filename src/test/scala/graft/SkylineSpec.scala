package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Skyline (Pareto frontier) tie semantics and the two-phase plan
  * shape — the sf oracle gate pins testdata equivalence; these pin the
  * dominance edge cases it can't isolate. */
class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def writeOrders(rows: (Long, Double, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("skyline").toString
    rows.map { case (k, p, d) => (k, p, ts(d)) }
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .select(col("o_orderkey"), lit(1L).as("o_custkey"), lit("O").as("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), lit("1-URGENT").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("dominance edges: ties on one dim dominate only when strict on the other") {
    val dir = writeOrders(
      (1L, 100.0, "1995-01-01"), // frontier (cheapest-date, max price among its date)
      (2L, 100.0, "1995-02-01"), // same price as 1, LATER date → dominated by 1
      (3L, 90.0, "1995-01-01"),  // same date as 1, LOWER price → dominated by 1
      (4L, 120.0, "1995-03-01"), // higher price, later date → frontier
      (5L, 50.0, "1994-01-01"))  // earliest date → frontier despite low price
    val keys = Relational.qSkyline(spark, dir).select("o_orderkey")
      .as[Long].collect().toSet
    assert(keys === Set(1L, 4L, 5L))
  }

  test("exact duplicate points both survive (neither strictly dominates)") {
    val dir = writeOrders(
      (1L, 100.0, "1995-01-01"),
      (2L, 100.0, "1995-01-01"), // exact duplicate of 1
      (3L, 10.0, "1996-01-01"))  // dominated by both
    val keys = Relational.qSkyline(spark, dir).select("o_orderkey")
      .as[Long].collect().toSet
    assert(keys === Set(1L, 2L))
  }

  test("two-phase plan: bucketed local prune precedes the global window") {
    val dir = writeOrders((1L, 1.0, "1995-01-01"))
    val plan = Relational.qSkyline(spark, dir).queryExecution.optimizedPlan.toString
    // phase 1 windows carry the 32-bucket partition spec; phase 2 is the
    // global pair — both present means the corpus never hits the global
    // single-partition sort unpruned
    assert(plan.contains("pmod(hash(o_orderkey"), plan)
    // 4 window specs total: bucketed min/max (phase 1) + global min/max
    // (phase 2, running only over phase-1 survivors)
    assert("windowspecdefinition".r.findAllIn(plan).length === 4, plan)
  }
}
