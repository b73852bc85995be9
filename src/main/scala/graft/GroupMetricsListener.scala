package graft

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Per-job-group executor task-metric accumulator — the load-invariant
  * regression signal the wall clock cannot provide (VERDICT r15 #1:
  * q_bloom_decontaminate's 2.6 s → 40 s swings under co-tenant load
  * were unadjudicable from wall + the 1-min load average alone; CPU
  * time is what the plan itself consumed regardless of who else was
  * on the host).
  *
  * Attribution chain: the bench runs each query invocation in its own
  * uniquely-named job group (Bench.collectWatched) → `onJobStart`
  * reads the group from the job's properties and maps the job's
  * stages to it → `onTaskEnd` charges that stage's task metrics to
  * the group. Three columns per group:
  *
  *   - `cpuSec`: Σ executorCpuTime over all tasks (ns → s). Pure
  *     on-CPU time, EXCLUDES scheduler wait, shuffle-fetch wait, GC
  *     pauses attributed to the executor thread, and co-tenant
  *     starvation — a compute-bound query's CPU ratio to its baseline
  *     is stable under host load where wall inflates 10×.
  *   - `runSec`: Σ executorRunTime (ms → s). Task wall; the
  *     cpu/run gap is the in-task wait (IO, GC, starvation).
  *   - `peakMemMb`: max per-task peakExecutionMemory — the largest
  *     single-task unsafe-memory footprint (the number that predicts
  *     spill at scale; Spark's UI column of the same name).
  *
  * Driver-side work (plan compile, collect deserialization, the
  * driver half of a localCheckpoint) is NOT in any column — the
  * signal is deliberately executor-only, where the data-proportional
  * work lives. Readers must drain the async listener bus before a
  * final read ([[org.apache.spark.graftbridge.CoreBridge]]); the
  * snapshot is otherwise racy against in-flight task-end events.
  *
  * Memory bounds: one Acc per query invocation (~2k entries over a
  * 305-query × 6-pass bench) and one Int→String entry per stage —
  * both trivially bounded by the run's own size; no eviction needed
  * in a bench-lifetime JVM.
  */
final class GroupMetricsListener extends SparkListener {
  private final class Acc {
    val cpuNs = new LongAdder
    val runMs = new LongAdder
    val peakMem = new AtomicLong(0L)
  }
  private val stageGroup = TrieMap.empty[Int, String]
  private val accs = TrieMap.empty[String, Acc]

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val g = Option(js.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      .getOrElse("")
    if (g.nonEmpty) js.stageIds.foreach(sid => stageGroup.put(sid, g))
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    for (g <- stageGroup.get(te.stageId); m <- Option(te.taskMetrics)) {
      val a = accs.getOrElseUpdate(g, new Acc)
      a.cpuNs.add(m.executorCpuTime)
      a.runMs.add(m.executorRunTime)
      val peak = m.peakExecutionMemory
      var cur = a.peakMem.get()
      while (peak > cur && !a.peakMem.compareAndSet(cur, peak))
        cur = a.peakMem.get()
    }

  /** Total executor CPU seconds charged to `group` so far. */
  def cpuSec(group: String): Double =
    accs.get(group).map(_.cpuNs.sum() / 1e9).getOrElse(0.0)

  /** Total executor task-run seconds charged to `group` so far. */
  def runSec(group: String): Double =
    accs.get(group).map(_.runMs.sum() / 1e3).getOrElse(0.0)

  /** Largest single-task peak execution memory (MB) seen in `group`. */
  def peakMemMb(group: String): Double =
    accs.get(group).map(_.peakMem.get() / (1024.0 * 1024.0)).getOrElse(0.0)
}
