package graft

import org.apache.spark.sql.functions._

import graft.plans.Graft

/** The native bounded-heap top-k aggregate: equality with the window
  * form under adversarial partitioning (merge correctness), SQL-name
  * registration, and edge semantics. */
class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  test("top_k equals the window top-k under random repartitioning") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 5000).map(_ => (rnd.nextInt(7), rnd.nextInt(1000).toLong))
    // hash-partition on v: every group's members span many partitions,
    // so the final answer exists only through partial-heap merges
    val df = rows.toDF("g", "v").repartition(20, col("v"))
    Graft.install(spark)
    df.createOrReplaceTempView("topk_in")
    val agg = spark.sql(
      "SELECT g, top_k(v, 5) AS topv FROM topk_in GROUP BY g")
      .select(col("g"), posexplode(col("topv")).as(Seq("p", "v")))
      .select(col("g"), (col("p") + 1).as("rnk"), col("v"))
      .as[(Int, Long, Long)].collect().toSet
    val window = spark.sql(
      """SELECT g, rn, v FROM (
        |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn
        |  FROM topk_in) WHERE rn <= 5""".stripMargin)
      .as[(Int, Long, Long)].collect().toSet
    // multiset equality: equal values may swap rn among themselves, so
    // compare (g, rnk) -> v maps, which ties make identical anyway
    assert(agg == window)
  }

  test("top_k under streaming update mode: state serde across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    Graft.install(spark)
    val input = MemoryStream[(Int, Long)]
    val agg = input.toDF().toDF("g", "v")
      .groupBy("g").agg(expr("top_k(v, 3)").as("topv"))
    val q = agg.writeStream.format("memory").queryName("topk_stream")
      .outputMode("update").start()
    try {
      // the state store must round-trip partial heaps between batches
      input.addData((1, 10L), (1, 30L), (2, 5L))
      q.processAllAvailable()
      input.addData((1, 20L), (1, 40L), (2, 1L))
      q.processAllAvailable()
      val last = spark.sql("SELECT g, topv FROM topk_stream")
        .as[(Int, Seq[Long])].collect()
        .groupBy(_._1).map { case (g, rows) => (g, rows.last._2) }
      assert(last(1) == Seq(40L, 30L, 20L)) // merged across both batches
      assert(last(2) == Seq(5L, 1L))
    } finally q.stop()
  }

  test("top_k: groups smaller than k, nulls skipped, k=1") {
    Graft.install(spark)
    Seq((1, Some(10L)), (1, None), (2, Some(5L)), (2, Some(7L)), (2, Some(3L)))
      .toDF("g", "v").createOrReplaceTempView("topk_small")
    val out = spark.sql("SELECT g, top_k(v, 2) AS t FROM topk_small GROUP BY g")
      .as[(Int, Seq[Long])].collect().toMap
    assert(out(1) == Seq(10L))        // null skipped, short group kept short
    assert(out(2) == Seq(7L, 5L))     // sorted descending
    val k1 = spark.sql("SELECT top_k(v, 1) FROM topk_small")
      .as[Seq[Long]].head()
    assert(k1 == Seq(10L))
  }
}
