package graft

import org.apache.spark.sql.functions._

/** Pins the [[Memo]] contract (the r13 generalization of the
  * suffix-ranks memo, now also carrying the minhash dedup spine):
  * compute-once per (session, dir), boundary-aware invalidation via
  * [[Tables.invalidate]], checkpointed entries, and explicit storage
  * release for dropped entries. */
class MemoSpec extends SparkSpec {

  private def tmpDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("memo-spec").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "src", t.length.toLong, "en") }
      .toDF("doc_id", "text", "source", "n_chars", "lang")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("memo computes once per (session, dir) and serves the same frame") {
    val m = new Memo("memo-spec-count")
    var computes = 0
    val dir = tmpDocs(Seq("aaaa", "bbbb"))
    def get() = m(spark, dir) {
      computes += 1
      Tables.documents(spark, dir).select(col("doc_id"))
    }
    val first = get()
    val second = get()
    assert(computes === 1, "second read must be served from the memo")
    assert(first eq second, "the memo serves the identical frame")
    assert(first.count() === 2L)
  }

  test("Tables.invalidate flushes matching entries and frees their blocks") {
    val m = new Memo("memo-spec-inval")
    var computes = 0
    val dir = tmpDocs(Seq("cccc"))
    def get() = m(spark, dir) {
      computes += 1
      Tables.documents(spark, dir).select(col("doc_id"))
    }
    val before = get()
    // the entry is localCheckpointed: its leaf RDD is persisted
    val rddOf = (df: org.apache.spark.sql.DataFrame) =>
      df.queryExecution.analyzed.collectLeaves().collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.get
    assert(rddOf(before).getStorageLevel.useMemory,
      "memo entries must be checkpointed (persisted)")

    // sibling prefix must NOT flush (boundary-aware, same as Tables)
    Tables.invalidate(dir + "XYZ")
    get(): Unit
    assert(computes === 1, "a sibling-prefix invalidation must not evict")

    Tables.invalidate(dir)
    val after = get()
    assert(computes === 2, "a matching invalidation must force a recompute")
    assert(!(before eq after))
    // ADVICE r12: the dropped entry's checkpoint blocks are unpersisted
    // EXPLICITLY (not left to an eventual GC)
    assert(rddOf(before).getStorageLevel ===
      org.apache.spark.storage.StorageLevel.NONE,
      "dropped entry's checkpoint blocks must be explicitly unpersisted")
  }

  test("dedup spine is memoized: pairs and components frames are shared") {
    val dir = tmpDocs(Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the lazy dog again and again!",
      "an entirely different document about distributed query engines"))
    val p1 = operators.Dedup.minhashCandidatePairs(spark, dir)
    val p2 = operators.Dedup.minhashCandidatePairs(spark, dir)
    assert(p1 eq p2, "candidate pairs must be served from the memo")
    val c1 = operators.Dedup.minhashComponents(spark, dir)
    val c2 = operators.Dedup.minhashComponents(spark, dir)
    assert(c1 eq c2, "components must be served from the memo")
    // and the memoized spine still answers correctly
    assert(p1.count() >= 1L, "near-identical pair must be a candidate")
    val labels = c1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) === 0L, "doc 1 joins doc 0's component")

    // a rewritten corpus must flush the spine (immutability contract)
    import spark.implicits._
    Seq((0L, "zzzz", "src", 4L, "en"))
      .toDF("doc_id", "text", "source", "n_chars", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.invalidate(dir)
    val p3 = operators.Dedup.minhashCandidatePairs(spark, dir)
    assert(!(p3 eq p1), "invalidation must evict the spine memo")
    assert(p3.count() === 0L, "post-rewrite spine reads the new corpus")
  }

  test("memo builds are logged with the paying thread and a wall time") {
    val dir = tmpDocs(Seq("cccc", "dddd"))
    val m = new Memo("memo-spec-attribution")
    val before = Memo.buildEvents().size
    val t = new Thread(() => {
      m(spark, dir)(Tables.documents(spark, dir).select(col("doc_id"))): Unit
    }, "memo-spec-payer")
    t.start(); t.join()
    // a second touch serves the cached frame: no new build event
    m(spark, dir)(Tables.documents(spark, dir).select(col("doc_id"))): Unit
    val events = Memo.buildEvents().drop(before)
    val mine = events.filter(_.memo == "memo-spec-attribution")
    assert(mine.size === 1, s"exactly one build event, got $events")
    assert(mine.head.thread === "memo-spec-payer",
      "the build must be attributed to the thread that paid it")
    assert(mine.head.ms > 0.0, "build wall time must be recorded")
    assert(mine.head.dir === dir)
    assert(mine.head.won, "an uncontended build wins the insert race")
  }
}
