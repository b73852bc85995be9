package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Skew}

/** Scale-path operators: IVF ANN recall, salted aggregation/join
  * equivalence, bucketed co-located join (no Exchange in the plan). */
class ScaleSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("IVF index: assignments cover corpus; topk recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val (centroids, assignments) = Similarity.buildIvfIndex(emb, k = 8, iters = 1)
    assert(centroids.count() == 8)
    assert(assignments.count() == emb.count())
    val queries = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopk(queries, emb, centroids, assignments, topK = 5, nprobe = 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.cosineTopkFloat(queries, emb, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall@5 with nprobe=3 of 8 buckets should recover a majority
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // and every query returns exactly topK candidates
    assert(ivf.groupBy(_._1).forall(_._2.size == 5))
  }

  test("salted aggregation == plain aggregation") {
    val li = Tables.lineitem(spark, sf)
    val plain = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum("l_quantity").as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(li, col("l_returnflag"), col("l_quantity"), 16)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(math.abs(salted(k)._1 - s) < 1e-6 && salted(k)._2 == n, s"key $k")
    }
  }

  test("salted join == plain join") {
    import spark.implicits._
    val big = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val small = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = big.join(small, "l_orderkey").count()
    val salted = Skew.saltedJoin(big, small, "l_orderkey", 8).count()
    assert(plain == salted)
  }

  test("triangle-salted self-pairs: exact pair set on a hot key, work split across cells") {
    import spark.implicits._
    // one pathologically hot band bucket (500 ids) plus normal ones
    val rows = (0L until 500L).map(id => ("hot", id)) ++
      (0L until 40L).map(id => (s"cold_${id % 10}", 1000L + id))
    val df = rows.toDF("band_key", "doc_id")
    val g = 4
    val pairs = Skew.saltedSelfPairs(df, Seq("band_key"), "doc_id", g)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactness: every unordered same-key pair exactly once
    val expected = rows.groupBy(_._1).values.flatMap { grp =>
      val ids = grp.map(_._2)
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }.toSet
    assert(pairs.length == expected.size, "a pair was dropped or duplicated")
    assert(pairs.toSet == expected)
    // balance: the hot key's quadratic work is spread over the
    // g(g+1)/2 salt cells — no cell (reducer) holds more than a
    // modest multiple of the ideal share, vs 100% unsalted
    def salt(id: Long): Int = {
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(id, org.apache.spark.sql.types.LongType, 42).toInt
      ((h % g) + g) % g
    }
    val hotPairs = expected.filter(_._1 < 500)
    val cellCounts = hotPairs
      .groupBy { case (x, y) =>
        (math.min(salt(x), salt(y)), math.max(salt(x), salt(y))) }
      .map(_._2.size)
    val nCells = g * (g + 1) / 2
    assert(cellCounts.size == nCells, "hot key did not reach every salt cell")
    assert(cellCounts.max < hotPairs.size / 2,
      s"one cell holds ${cellCounts.max} of ${hotPairs.size} hot pairs")
  }

  test("bucketed tables join without a shuffle Exchange") {
    val wh = Files.createTempDirectory(Paths.get("target"), "warehouse")
    val s2 = spark.newSession() // warehouse.dir is static; use explicit paths
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val li = Tables.lineitem(s2, sf)
    val ord = Tables.orders(s2, sf)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    ord.withColumnRenamed("o_orderkey", "l_orderkey")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")
    val joined = s2.table("li_b").join(s2.table("ord_b"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed join: SortMergeJoin with NO shuffle exchange
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join plan:\n$plan")
    assert(joined.count() > 0)
    s2.sql("DROP TABLE IF EXISTS li_b")
    s2.sql("DROP TABLE IF EXISTS ord_b")
  }
}
