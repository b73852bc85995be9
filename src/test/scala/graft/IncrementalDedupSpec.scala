package graft

import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** Incremental ingest dedup: all three statuses on planted duplicates
  * (the sf corpus has unique texts, so the gate only sees `new`), the
  * corpus-precedence rule, and the co-partitioned plan shape. */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  /** The operator's batch rule, replicated: md5Long("incr|id") % 5 == 0. */
  private def incoming(id: Long): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"incr|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 5 == 0
  }

  private def writeDocs(rows: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("incr").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("statuses: dup_of_corpus beats dup_in_batch; first holders reported") {
    val ids = (1L to 400L)
    val inc = ids.filter(incoming).take(4)   // ≥4 incoming ids
    val ex = ids.filterNot(incoming).take(2) // existing ids
    assert(inc.length === 4 && ex.length === 2)
    val Seq(i1, i2, i3, i4) = inc.sorted.toSeq
    val Seq(e1, e2) = ex.sorted.toSeq
    val dir = writeDocs(
      (e1, "stored page"),     // corpus holds this content...
      (e2, "other stored"),
      (i1, "stored page"),     // ...incoming re-crawl → dup_of_corpus
      (i2, "fresh content"),   // first in batch → new
      (i3, "fresh content"),   // same fp, later id → dup_in_batch
      (i4, "unique arrival"))  // → new
    val r = Snapshots.qIncrementalDedup(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getString(1), if (x.isNullAt(2)) -1L else x.getLong(2)))
      .toMap
    assert(r(i1) === (("dup_of_corpus", e1)))
    assert(r(i2) === (("new", -1L)))
    assert(r(i3) === (("dup_in_batch", -1L)))
    assert(r(i4) === (("new", -1L)))
    assert(r.size === 4) // existing docs never appear
  }

  test("corpus precedence: content in corpus AND earlier in batch → dup_of_corpus") {
    val ids = (1L to 400L)
    val inc = ids.filter(incoming).take(2)
    val e1 = ids.filterNot(incoming).head
    val Seq(i1, i2) = inc.sorted.toSeq
    val dir = writeDocs((e1, "shared"), (i1, "shared"), (i2, "shared"))
    val r = Snapshots.qIncrementalDedup(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(i1) === "dup_of_corpus")
    assert(r(i2) === "dup_of_corpus") // not dup_in_batch: corpus wins
  }

  test("plan: shuffled fingerprint join, no broadcast of a corpus-sized side") {
    val dir = writeDocs((1L to 50L).map(i => (i, s"text $i")): _*)
    val plan = Snapshots.qIncrementalDedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the fp join keys both sides on hashpartitioning(fp) — the
    // bucketed-corpus zero-exchange layout depends on this shape
    assert("hashpartitioning\\(fp".r.findAllIn(plan).nonEmpty, plan)
  }
}
