package graft

import org.apache.spark.sql.functions._

/** AQE skew-join splitting — the runtime half of the skew story
  * (operators/Skew.scala is the explicit half for known-hot keys):
  * a shuffle join whose one hot key dwarfs every other partition must
  * be re-planned with the skewed partition split across tasks. */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot-key partition of a sort-merge join") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      // force SMJ and scale AQE's skew thresholds down to fixture size
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 100k rows, half of them on ONE key — the giant-directory shape.
      // Downstream must NOT require the join's hash partitioning (a
      // groupBy(k) after the join would forbid splitting a partition);
      // a global aggregate keeps the join's output free to re-shape.
      val fact = spark.range(0, 100000)
        .select(when(col("id") % 2 === 0, 0L).otherwise(col("id") % 997L).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 997).select(col("id").as("k"), (col("id") * 10).as("w"))
      val q = fact.join(dim, "k").agg(sum(col("w")).as("s"), count(lit(1)).as("n"))
      val row = q.collect().head
      assert(row.getLong(1) == 100000L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"skew join not applied:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
