package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, dir) memo for an expensive derived DataFrame — the
  * in-session twin of a materialized artifact. The canonical user is
  * the minhash candidate-pair/component spine ([[operators.Dedup]]):
  * ~10 report queries sit on the same shingle→signature→band→pair
  * pipeline, and run directly each re-derived it from the corpus —
  * ten corpus scans for one dedup report at 100 TB, and at bench
  * scale the two worst r12 regressions (q_cluster_split 5.9×,
  * q_clustering_coeff 5.7× — both spine rebuilds). A memo entry is
  * the localCheckpointed result: narrow derived rows whose storage
  * frees when the entry drops.
  *
  * Contract (shared with [[Tables]]' reader cache): a (session, dir)
  * pair is immutable once read. Code that rewrites a previously-read
  * dir MUST call [[Tables.invalidate]], which flushes every memo via
  * the onInvalidate hook and EXPLICITLY unpersists the discarded
  * entries' checkpoint blocks (left to GC they pin executor storage
  * until an arbitrary later collection — ADVICE r12).
  *
  * Staleness protocol (inherited from the r11 suffix-ranks memo): the
  * hook's remove lands BEFORE a racing compute's insert, so an entry
  * can be born stale (computed from the pre-rewrite dir). Every entry
  * records the invalidation generation current when its compute
  * STARTED; a read treats it as stale iff a LATER invalidation
  * matches the dir — so a stale entry is neither kept NOR served. The
  * recheck loop is BOUNDED (ADVICE r12: the unbounded form could
  * recompute forever under a pathological invalidation cadence):
  * after [[Memo.MaxAttempts]] discarded attempts the caller gets a
  * fresh un-memoized compute — correct, just not cached.
  */
final class Memo(name: String) {
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (Long, DataFrame)]
  private val invalGen = new java.util.concurrent.atomic.AtomicLong(0)
  /** Per-prefix log of the LAST invalidation generation — bounded by
    * the number of distinct fixture dirs ever invalidated. */
  private val invalLog = scala.collection.concurrent.TrieMap.empty[String, Long]

  private def prefixMatches(dir: String, prefix: String): Boolean = {
    val dirPrefix = prefix.stripSuffix("/") + "/"
    dir == prefix || dir.startsWith(dirPrefix) ||
      dirPrefix.startsWith(dir.stripSuffix("/") + "/")
  }

  Tables.onInvalidate(name) { prefix =>
    cache.keysIterator
      .filter(k => prefixMatches(k._2, prefix) ||
        // stopped-session entries pin localCheckpoint blocks for
        // nothing — sweep them on every invalidation too
        k._1.sparkContext.isStopped)
      .foreach(drop)
    invalLog.put(prefix.stripSuffix("/"), invalGen.incrementAndGet())
  }

  private def drop(k: (SparkSession, String)): Unit =
    cache.remove(k).foreach { case (_, df) => Memo.freeCheckpoint(df) }

  /** The memoized frame for (s, d), computing (and localCheckpointing)
    * on first touch. `compute` must be a pure function of the dir's
    * contents — entries are shared across every caller in the JVM. */
  def apply(s: SparkSession, d: String)(compute: => DataFrame): DataFrame = {
    cache.keysIterator.filter(_._1.sparkContext.isStopped).foreach(drop)
    var attempts = 0
    while (attempts < Memo.MaxAttempts) {
      val g0 = invalGen.get()
      val entry = cache.get((s, d)) match {
        case Some(e) => e
        case None =>
          val t0 = System.nanoTime()
          val built = Memo.ensureCheckpointed(compute)
          val ms = (System.nanoTime() - t0) / 1e6
          val fresh = (g0, built)
          // attribution record (VERDICT r14 #6): the spine build cost
          // lands on whichever caller touches the memo first — in a
          // shuffled bench pass that is a random family member, which
          // made that query's pass-1 wall uninterpretable. The log
          // names the payer; Bench ships it in the artifact. Logged
          // AFTER the insert race resolves (ADVICE r15): a losing
          // thread still paid the build wall (its event stays — that
          // cost IS in its query's measurement), but the event now
          // carries won=false so memo_builds distinguishes the build
          // the memo retained from a concurrent duplicate that was
          // immediately freed.
          cache.putIfAbsent((s, d), fresh) match {
            case Some(winner) => // lost the insert race: free our copy
              Memo.logBuild(name, d, ms, won = false)
              Memo.freeCheckpoint(fresh._2); winner
            case None =>
              Memo.logBuild(name, d, ms, won = true)
              fresh
          }
      }
      val stale = invalLog.exists { case (p, g) =>
        g > entry._1 && prefixMatches(d, p) }
      if (!stale) { Memo.logRead(name); return entry._2 }
      drop((s, d))
      attempts += 1
    }
    // pathological invalidation cadence: serve a correct, un-memoized
    // result rather than looping (its blocks free via GC as usual)
    compute.localCheckpoint()
  }
}

object Memo {
  private[graft] val MaxAttempts = 3

  /** One memo-build event: (memo name, dir, building thread's name,
    * build wall ms, whether this build WON the insert race and was
    * retained — a lost race's build is freed immediately, but its
    * wall cost landed in the losing query's measurement all the same,
    * so both are logged and the flag tells them apart (ADVICE r15)).
    * The thread name attributes the build to the paying query when
    * the caller names its threads (Bench does:
    * "bench-seq:&lt;query&gt;#k"). Bounded: a JVM builds each (memo,
    * dir) at most a handful of times (invalidations), so the queue
    * stays tiny; the 4096 cap is a leak backstop, not a budget. */
  final case class BuildEvent(memo: String, dir: String, thread: String,
                              ms: Double, won: Boolean)
  private val buildLog = new java.util.concurrent.ConcurrentLinkedQueue[BuildEvent]
  private def logBuild(memo: String, dir: String, ms: Double, won: Boolean): Unit = {
    if (buildLog.size < 4096)
      buildLog.add(BuildEvent(memo, dir, Thread.currentThread().getName, ms, won)): Unit
  }
  /** Snapshot of every memo build this JVM has paid for, in order. */
  def buildEvents(): Seq[BuildEvent] = {
    import scala.jdk.CollectionConverters._
    buildLog.iterator().asScala.toSeq
  }

  /** Distinct (memo, reader-thread) pairs — which query paths TOUCH
    * each memo family (VERDICT r16 #2: the bench needs per-family
    * build + rider attribution so a "14× per-query win" that is
    * really cost moved to a shared build is first-class in the
    * artifact, not narrative). The reading thread's name is recorded
    * with Bench's "#<invocation>" suffix stripped so five passes of
    * one query collapse to one entry; bounded by (memo families ×
    * query surface), a few thousand entries at most. */
  private val readLog = scala.collection.concurrent.TrieMap.empty[(String, String), Unit]
  private def logRead(memo: String): Unit = {
    val t = Thread.currentThread().getName
    val cut = t.lastIndexOf('#')
    readLog.put((memo, if (cut > 0) t.substring(0, cut) else t), ()): Unit
  }
  /** Every (memo, reader) pair seen this JVM, sorted. */
  def readEvents(): Seq[(String, String)] = readLog.keysIterator.toSeq.sorted

  /** The memo entry's materialization. A compute that already ENDS in
    * a persisted localCheckpoint (the suffix spine checkpoints its
    * final round itself so it can pick the storage level and free its
    * intermediate round frames, r17) is used as-is — re-checkpointing
    * it would copy the whole table into a second set of blocks for
    * nothing. Everything else gets the usual localCheckpoint. */
  private[graft] def ensureCheckpointed(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD
        if lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE => df
      case _ => df.localCheckpoint()
    }

  /** Best-effort explicit unpersist of a localCheckpointed frame's
    * storage blocks. A checkpointed Dataset's analyzed plan is a
    * LogicalRDD leaf over the persisted internal RDD; dropping the
    * reference frees the blocks only at the NEXT driver GC (via
    * ContextCleaner), which under memory pressure is exactly too late
    * — evicted MEMORY_AND_DISK blocks charge their I/O to whatever
    * query runs next. Non-checkpointed plans (no LogicalRDD leaf) are
    * a no-op. blocking=false: removal is async, correctness never
    * depends on it (a discarded entry is never served again). */
  private[graft] def freeCheckpoint(df: DataFrame): Unit =
    scala.util.Try {
      df.queryExecution.analyzed.collectLeaves().foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }: Unit
}
