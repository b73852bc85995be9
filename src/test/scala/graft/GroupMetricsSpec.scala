package graft

import org.apache.spark.graftbridge.CoreBridge

/** Pins the per-job-group task-metric attribution behind the bench's
  * r16 CPU column ([[GroupMetricsListener]]): CPU/run time land on the
  * group that ran the job, groups are isolated from each other, and an
  * unseen group reads zero (never throws). */
class GroupMetricsSpec extends SparkSpec {

  test("task CPU/run/peak-mem accrue to the owning job group, isolated per group") {
    val l = new GroupMetricsListener
    spark.sparkContext.addSparkListener(l)
    try {
      def runInGroup(group: String, n: Long): Unit = {
        spark.sparkContext.setJobGroup(group, "gm-spec", interruptOnCancel = false)
        try {
          // hash-aggregate over a shuffle: real executor CPU plus
          // unsafe execution memory, so all three columns move
          spark.range(0, n, 1, 4)
            .selectExpr("pmod(xxhash64(cast(id as string)), 1000) as k")
            .groupBy("k").count()
            .collect(): Unit
        } finally spark.sparkContext.clearJobGroup()
      }
      runInGroup("gm-spec-a", 500000L)
      runInGroup("gm-spec-b", 500000L)
      assert(CoreBridge.waitListenerBusEmpty(spark.sparkContext, 30000),
        "listener bus must drain")
      val (cpuA, cpuB) = (l.cpuSec("gm-spec-a"), l.cpuSec("gm-spec-b"))
      assert(cpuA > 0.0, "group a must accrue executor CPU time")
      assert(cpuB > 0.0, "group b must accrue executor CPU time")
      assert(l.runSec("gm-spec-a") > 0.0, "task run time must accrue")
      assert(l.peakMemMb("gm-spec-a") >= 0.0)
      // a second identical job accrues to ITS group only: re-running b
      // must not move a
      runInGroup("gm-spec-b", 500000L)
      assert(CoreBridge.waitListenerBusEmpty(spark.sparkContext, 30000))
      assert(l.cpuSec("gm-spec-a") === cpuA, "group a unchanged by group b's jobs")
      assert(l.cpuSec("gm-spec-b") > cpuB, "group b accrues its second job")
      // unseen group reads zero, never throws
      assert(l.cpuSec("gm-spec-never") === 0.0)
      assert(l.peakMemMb("gm-spec-never") === 0.0)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
