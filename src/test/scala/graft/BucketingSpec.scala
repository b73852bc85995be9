package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Bucketed tables: the co-located join must plan with zero exchanges
  * (both sides pre-shuffled at write time) and produce the same rows
  * as the plain shuffled join; a bucket-key aggregation must also be
  * exchange-free.
  */
class BucketingSpec extends SparkSpec {

  private def withBroadcastDisabled[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-bucketed join is exchange-free and row-identical to the shuffled join") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bucket").toString
    val facts = (1L to 5000L).map(i => (i % 997, i, i * 3)).toDF("k", "a", "b")
    val dims = (0L until 997L).map(i => (i, s"name_$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "bkt_facts", 8, Seq("k"), Seq("k"), Some(s"$dir/facts"))
    Bucketing.writeBucketed(dims, "bkt_dims", 8, Seq("k"), Seq("k"), Some(s"$dir/dims"))
    try {
      withBroadcastDisabled {
        val joined = Bucketing.coLocatedJoin(spark, "bkt_facts", "bkt_dims", Seq("k"))
          .select(col("k"), col("a"), col("name"))
        assert(Bucketing.exchangeCount(joined) === 0,
          joined.queryExecution.executedPlan.toString)
        val got = joined.as[(Long, Long, String)].collect().toSet
        val want = facts.join(dims, "k").select(col("k"), col("a"), col("name"))
          .as[(Long, Long, String)].collect().toSet
        assert(got === want)
        assert(got.size === 5000)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("bucket-key aggregation reads the layout and skips the shuffle") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bucket-agg").toString
    val facts = (1L to 2000L).map(i => (i % 101, i)).toDF("k", "v")
    Bucketing.writeBucketed(facts, "bkt_agg", 4, Seq("k"), Seq("k"), Some(s"$dir/agg"))
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v").as("s"))
      assert(Bucketing.exchangeCount(agg) === 0,
        agg.queryExecution.executedPlan.toString)
      val got = agg.as[(Long, Long)].collect().toMap
      val want = facts.groupBy("k").agg(sum("v").as("s")).as[(Long, Long)].collect().toMap
      assert(got === want)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }

  test("unbucketed join of the same data DOES shuffle (the layout is what removes it)") {
    import spark.implicits._
    withBroadcastDisabled {
      val facts = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "a")
      val dims = (0L until 97L).map(i => (i, i * 2)).toDF("k", "d")
      val joined = facts.join(dims, "k")
      assert(Bucketing.exchangeCount(joined) > 0)
    }
  }
}
