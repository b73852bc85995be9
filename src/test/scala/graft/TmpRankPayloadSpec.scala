package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}

import graft.operators.Ranking

class TmpRankPayloadSpec extends SparkSpec {
  test("correctness + stage stats in one execution") {
    import spark.implicits._
    val rows = (1L to 100000L).map(i => (i, (i * 7919) % 99991, s"payload_$i"))
    val df = rows.toDF("id", "v", "payload")
    val ranked = Ranking.globalRowNumber(df, Seq(col("v"), col("id")))
      .select("id", "rn")
    val got = ranked.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast(LongType))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val diffs = got.count { case (k, r) => want(k) != r }
    println(s"=== MISMATCHES $diffs of ${got.size}; dup-rns ${got.size - got.values.toSet.size} ===")
    val adaptive = ranked.queryExecution.executedPlan
      .collect { case a: AdaptiveSparkPlanExec => a }
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case s: ShuffleQueryStageExec =>
        println("=== STAGE id=" + s.id + " head=" + s.plan.nodeName + " " +
          s.plan.simpleStringWithNodeId() + " bytes=" +
          s.mapStats.map(_.bytesByPartitionId.mkString(",")).getOrElse("none") + " ===")
        walk(s.plan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
      case other => other.children.foreach(walk)
    }
    adaptive.foreach(a => walk(a.executedPlan))
  }
}
