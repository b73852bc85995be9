package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Runtime filtering at the scan — the two behaviors that keep a 100 TB
  * fact⋈dim join from reading the whole fact table:
  *
  *  - dynamic partition pruning: the dim side's filter result prunes
  *    the fact's Hive-style partitions at execution time;
  *  - runtime bloom filters: for non-partition join keys, a bloom
  *    filter built from the filtered creation side is pushed into the
  *    fact scan.
  *
  * Both are Catalyst built-ins the engine's plans must not defeat —
  * these specs pin that they actually fire on our data shapes. */
class RuntimePruningSpec extends SparkSpec {

  test("dynamic partition pruning skips fact partitions at runtime") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpp").toString
    Tables.orders(spark, "/root/testdata/sf0.001")
      .write.partitionBy("o_orderpriority").parquet(s"$dir/orders_part")
    val fact = spark.read.parquet(s"$dir/orders_part")
    val total = fact.count()

    // dim restricts to one of five priorities; its filter is only known
    // at run time from the dim scan, not statically on the fact. The
    // dim must be a real scan with a surviving selective Filter — a
    // LocalRelation gets constant-folded and the DPP rule then sees no
    // filtering side at all.
    Seq(("1-URGENT", "u"), ("5-LOW", "skip")).toDF("pri", "tag")
      .write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("tag") === "u")
    val q = fact.join(dim, fact("o_orderpriority") === dim("pri"))
      .groupBy("tag").agg(count(lit(1)).as("n"))
    val rows = q.collect()

    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP in plan:\n$plan")
    // the scan hides under AQE wrappers: the adaptive root and every
    // query stage are childless nodes, so walk into them explicitly
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def factScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => factScans(a.executedPlan)
      case s: QueryStageExec => factScans(s.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(factScans)
    }
    val scanned = factScans(q.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.mkString.contains("orders_part"))
      .map(_.metrics("numOutputRows").value).max
    assert(scanned < total / 2, s"DPP must skip most partitions: $scanned of $total")
    assert(rows.map(_.getLong(1)).sum == scanned)
  }

  test("runtime bloom filter is injected on a selective non-partition join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join (bloom filters only apply there) and drop
      // the size thresholds that gate injection on real clusters
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

      val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      val ord = Tables.orders(spark, "/root/testdata/sf0.001")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter in plan:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
