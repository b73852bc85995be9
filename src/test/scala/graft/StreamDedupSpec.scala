package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.StreamDoc

/** Streaming near-dup suppression: first arrival per simhash signature
  * survives, word-order shuffles of seen text are dropped, state
  * expires on the event-time TTL, and the per-row JVM signature is
  * bit-identical to the batch Catalyst one. */
class StreamDedupSpec extends SparkSpec {

  test("JVM simhash twin equals the batch expression signature") {
    import spark.implicits._
    val texts = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different words entirely"),
      (5L, "x"))
    val batch = Dedup.simhashSignatures(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(StreamDedup.simhash32(t) == batch(id),
        s"doc $id: JVM twin diverges from batch signature")
    }
  }

  test("first arrival wins; reordered text drops; TTL reopens the signature") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    def ts(off: Long) = new Timestamp((t0 + off) * 1000)

    val input = MemoryStream[StreamDoc]
    val kept = StreamDedup.suppressNearDups(
      input.toDS(), watermarkDelay = "5 seconds", ttlMillis = 60 * 1000L)
    val q = kept.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: original, word-order shuffle (same signature), distinct
      input.addData(
        StreamDoc(1L, "alpha beta gamma delta", ts(0)),
        StreamDoc(2L, "delta gamma beta alpha", ts(1)),
        StreamDoc(3L, "some totally unrelated document text", ts(2)))
      q.processAllAvailable()
      // batch 2: re-arrival within TTL — suppressed by state
      input.addData(StreamDoc(4L, "alpha beta gamma delta", ts(10)))
      q.processAllAvailable()
      // push the watermark past signature-1's timeout (last arrival
      // t+10, ttl 60s, watermark delay 5s → timeout fires once the
      // max event time exceeds t+75)
      input.addData(StreamDoc(5L, "watermark advancing heartbeat row", ts(200)))
      q.processAllAvailable()
      // batch 4: same text again — state expired, kept again
      input.addData(StreamDoc(6L, "alpha beta gamma delta", ts(210)))
      q.processAllAvailable()

      val out = spark.table("dedup_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out.contains(1L), "first arrival must be kept")
      assert(!out.contains(2L), "word-order shuffle of seen text must drop")
      assert(out.contains(3L), "distinct text must be kept")
      assert(!out.contains(4L), "re-arrival within TTL must drop")
      assert(out.contains(6L), "after TTL expiry the signature reopens")
    } finally q.stop()
  }

  test("hot-signature skew: 10^6 same-signature rows in one batch, O(1) group pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    // a template-heavy burst: every row is the same short text → ONE
    // simhash group receives the entire batch. The group handler must
    // stream the iterator (running min/max), not buffer-and-sort it;
    // the winner is the (event time, doc_id) minimum — planted at a
    // mid-stream position with an earlier timestamp so a "first row
    // wins" or "min id wins" shortcut would both fail.
    val n = 1000000
    val text = "hot template text"
    val docs = (0 until n).map { i =>
      val off = if (i == 777777) 0L else 5L + (i % 7)
      StreamDoc(i + 10L, text, new Timestamp((t0 + off) * 1000))
    }
    val input = MemoryStream[StreamDoc]
    val kept = StreamDedup.suppressNearDups(
      input.toDS(), watermarkDelay = "5 seconds", ttlMillis = 60 * 1000L)
    val q = kept.writeStream.format("memory").queryName("dedup_hot")
      .outputMode("append").start()
    try {
      input.addData(docs)
      q.processAllAvailable()
      val out = spark.table("dedup_hot")
        .collect().map(r => (r.getLong(0), r.getTimestamp(2).getTime))
      assert(out.length == 1, s"exactly one survivor, got ${out.length}")
      assert(out.head == (777777L + 10L, t0 * 1000),
        s"winner must be the (ts, doc_id) minimum, got ${out.head}")
    } finally q.stop()
  }
}
