package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** HLL sketch surface: error bound vs exact, and the mergeability
  * contract (estimate of a union is partitioning-independent). */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sketch estimate lands within the lgK=12 error bound of exact") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val est = Sketches.approxDistinct(li, Seq("l_returnflag"), "l_orderkey")
      .agg(sum(col("approx_distinct"))).head().getLong(0)
    // per-group estimates, each ±1.6% rse at lgK=12; flags overlap on
    // orderkeys so the grouped sum only exceeds the global exact count
    assert(est > 0)
    val global = Sketches.approxDistinct(
      li.withColumn("g", lit(1)), Seq("g"), "l_orderkey")
      .head().getLong(1)
    assert(math.abs(global - exact).toDouble / exact < 0.05,
      s"estimate $global vs exact $exact")
  }

  test("merged per-shard sketches stay in the error band under any sharding") {
    val li = Tables.lineitem(spark, sf)
    // sketch per ingest increment, merge at query time — the no-rescan
    // rollup. Sparse-mode sketches keep a stream-order (HIP) estimator
    // a union cannot preserve bit-for-bit, so the contract is the
    // ERROR BAND, not estimate equality: however the stream is sharded,
    // the merged estimate lands within the lgK tolerance of exact.
    def mergedBy(shards: Int) = {
      val sharded = li.withColumn("shard", pmod(col("l_orderkey"), lit(shards)))
      val perShard = Sketches.distinctSketch(
        sharded, Seq("l_returnflag", "shard"), "l_orderkey")
      Sketches.mergeSketches(perShard.drop("shard"), Seq("l_returnflag"))
        .select(col("l_returnflag"), Sketches.estimate(col("dv_sketch")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val exact = li.groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(4, 16).foreach { shards =>
      val m = mergedBy(shards)
      assert(m.keySet == exact.keySet)
      m.keySet.foreach { k =>
        assert(math.abs(m(k) - exact(k)).toDouble / exact(k) < 0.05,
          s"$shards shards, flag $k: merged ${m(k)} vs exact ${exact(k)}")
      }
    }
  }

  test("sketch state stays kilobytes — rollups never rescan data") {
    val li = Tables.lineitem(spark, sf)
    val sizes = Sketches.distinctSketch(li, Seq("l_returnflag"), "l_orderkey")
      .select(length(col("dv_sketch"))).collect().map(_.getInt(0))
    assert(sizes.nonEmpty && sizes.forall(_ < 20000),
      s"sketches must be small: ${sizes.mkString(",")}")
  }

  test("cms grid: exact merge (partitioning-independent), per-row mass conservation") {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    def grid(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.agg(GraftSqlBridge.column(graft.functions.CmsLongsAgg(
          GraftSqlBridge.expression(col("h")), Literal(4))
          .toAggregateExpression()).as("cms"))
        .head().getAs[Seq[Long]]("cms").toArray
    val words = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("h", graft.functions.Exprs.md5Long(col("w")))
      .localCheckpoint()
    val n = words.count()
    val one = grid(words.coalesce(1))
    val many = grid(words.repartition(13))
    // counters are exact adds — ANY sharding yields the identical grid
    assert(one.toSeq === many.toSeq)
    // each of the 4 rows distributes exactly the full token mass
    (0 until 4).foreach { i =>
      assert(one.slice(i * 64, (i + 1) * 64).sum === n, s"row $i")
    }
    // point estimates never underestimate (one-sided CMS error)
    val exact = words.groupBy("w", "h").count().collect()
    exact.foreach { r =>
      val h = r.getAs[Long]("h")
      val est = (0 until 4).map(i =>
        one(i * 64 + graft.functions.CmsUtil.cellIndex(h, i))).min
      assert(est >= r.getAs[Long]("count"), r.getAs[String]("w"))
    }
  }
}
