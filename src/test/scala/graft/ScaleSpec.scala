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
