package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Ranking

/** Distributed global ranking: equals the single-window answer, never
  * plans an Exchange SinglePartition over the data, and the arithmetic
  * ntile matches the window ntile for awkward n/k combinations.
  */
class RankingSpec extends SparkSpec {

  test("globalRowNumber equals single-partition window row_number") {
    import spark.implicits._
    // keys deliberately collide on the first sort column; (v, id) is total
    val rows = (1L to 997L).map(i => (i, (i * 7919) % 13))
    val df = rows.toDF("id", "v")
    val got = Ranking.globalRowNumber(df, Seq(col("v"), col("id")))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast(LongType))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("plan has no single-partition exchange over the data") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("id", "v")
    val ranked = Ranking.globalRowNumber(df, Seq(col("v"), col("id")))
    val plan = ranked.queryExecution.executedPlan.toString
    // the offsets branch windows over ≤P count rows; the DATA path must
    // be range-partitioned. A SinglePartition exchange feeding a Window
    // over the input would print as Exchange SinglePartition above the
    // row scan — assert the data-side range exchange exists and count
    // the single-partition exchanges (offset branch only, ≤1).
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.linesIterator.count(_.contains("Exchange SinglePartition")) <= 1, plan)
    // the local rank must NOT be a pid-partitioned window — that shape
    // makes EnsureRequirements re-shuffle the whole DATA on pid. The
    // offsets branch may hash-exchange its P count rows (partition
    // keys are the derived pid grouping), but never the data columns.
    val hashExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashExchanges.forall(l => !l.contains("v#") && !l.contains("id#")),
      plan)
  }

  test("groupedRowNumber equals the partitioned window row_number") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, i % 3, (i * 31) % 17))
    val df = rows.toDF("id", "grp", "v")
    val got = Ranking.groupedRowNumber(df, Seq("grp"), Seq(col("v"), col("id")))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rn",
        row_number().over(Window.partitionBy("grp").orderBy(col("v"), col("id")))
          .cast(LongType))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("groupedRowNumber keeps the NULL-key group, exactly like the window") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 3L), (2L, None, 1L), (3L, Some("a"), 1L),
      (4L, None, 2L), (5L, Some("b"), 5L), (6L, None, 0L))
      .toDF("id", "grp", "v")
    val got = Ranking.groupedRowNumber(df, Seq("grp"), Seq(col("v"), col("id")))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rn",
        row_number().over(Window.partitionBy("grp").orderBy(col("v"), col("id")))
          .cast(LongType))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got.size === 6, "NULL-group rows must not be dropped")
  }

  test("ntileFromRn matches window ntile for ragged n/k") {
    import spark.implicits._
    for (n <- Seq(1, 7, 8, 9, 40, 41); k <- Seq(1, 3, 8)) {
      val df = (1L to n.toLong).toDF("rn")
      val got = df.select(col("rn"),
          Ranking.ntileFromRn(col("rn"), lit(n), k).as("b"))
        .as[(Long, Long)].collect().toMap
      val want = df.select(col("rn"),
          ntile(k).over(Window.orderBy("rn")).cast(LongType).as("b"))
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"n=$n k=$k")
    }
  }

  test("globalDenseRank equals single-partition window dense_rank (dup-heavy, skewed)") {
    import spark.implicits._
    // dup-heavy: ~97·t distinct keys over 20k rows; the boundary-stitch
    // path (same key straddling partition stats) and the re-aliased
    // self-join lineage (the round-10 inconsistent-boundaries bug) are
    // both exercised
    for (t <- Seq(1, 3)) {
      val df = (1 to 20000)
        .map(i => (i.toLong + t, (i * 7919 % (97 * t)).toLong)).toDF("id", "k")
      val want = df.withColumn("t",
          dense_rank().over(Window.orderBy("k")).cast(LongType))
        .select("id", "t").as[(Long, Long)].collect().toMap
      val got = Ranking.globalDenseRank(df, Seq(col("k")), "g")
        .select("id", "g").as[(Long, Long)].collect().toMap
      assert(got === want, s"t=$t")
    }
  }
}
