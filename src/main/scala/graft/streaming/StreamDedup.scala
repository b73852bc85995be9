package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate suppression — the ingest-time half of the
  * dedup story (operators/Dedup.scala is the batch half): a document
  * stream keeps only the FIRST arrival per 32-bit simhash signature,
  * so re-crawled pages, mirrored posts, and word-order shuffles of
  * already-seen text (same word multiset → same signature) never reach
  * the corpus.
  *
  * Shape: the signature is a pure per-row JVM computation (no shuffle,
  * no state), then ONE `flatMapGroupsWithState` keyed by signature with
  * O(1) state per distinct signature — the first doc_id — and an
  * event-time TTL so state is bounded by the dedup horizon, not the
  * stream's lifetime (the same contract as
  * `dropDuplicatesWithinWatermark`, which covers EXACT text; this
  * covers the word-multiset near-dup class that exact hashing misses).
  * At scale the state shuffles as (signature, first_id) pairs only.
  *
  * Determinism within a micro-batch: the keep decision is the running
  * (event time, doc_id) minimum over the group's arrivals — one pass,
  * O(1) memory even when a template-heavy stream lands a whole batch
  * on one hot signature — so replay after failure keeps the same
  * winner (exactly the A5 first-wins rule the batch side uses).
  */
object StreamDedup {

  case class StreamDoc(doc_id: Long, text: String, ts: Timestamp)
  case class KeptDoc(doc_id: Long, simhash: Long, ts: Timestamp)
  private[streaming] case class SigState(firstId: Long)

  /** Plain-JVM twin of [[graft.functions.Exprs.md5Long]]: first 15 hex
    * chars of md5, parsed base-16 (60-bit positive). Bit-identical to
    * the Catalyst expression — StreamDedupSpec pins equality against
    * the batch [[graft.operators.Dedup.simhashSignatures]]. */
  // one MessageDigest per thread: simhash32 calls md5Long once per WORD
  // on the ingest hot path, and getInstance("MD5") is a provider lookup
  // + allocation per call — measurable at stream rates
  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Long(s: String): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // first 15 hex chars == top 60 bits of the first 8 bytes, parsed
    // directly from the bytes (no hex-string round trip per word)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Plain-JVM twin of the batch simhash: per word (whitespace split,
    * empties dropped) each of the 32 low bits of md5Long votes ±1; the
    * signature sets bit b iff the vote sum is strictly positive. */
  def simhash32(text: String): Long = {
    val votes = new Array[Long](32)
    text.split(" ").foreach { w =>
      if (w.nonEmpty) {
        val h = md5Long(w)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** First-arrival-wins near-dup suppression. `ttl` bounds how long a
    * signature blocks re-ingestion (and therefore state size); after
    * the watermark passes a signature's last arrival + ttl, the state
    * drops and the text may enter again (the re-crawl refresh case). */
  def suppressNearDups(
      docs: Dataset[StreamDoc],
      watermarkDelay: String = "10 seconds",
      ttlMillis: Long = 3600 * 1000L): Dataset[KeptDoc] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      // NULL-text docs carry no signature: the batch twin's explode
      // emits no word rows for them, so they are absent from batch
      // signatures — mirror that by dropping them here instead of
      // NPE-ing the stream on text.split
      .filter((d: StreamDoc) => d.text != null)
      .map(d => (d.doc_id, simhash32(d.text), d.ts))
      .toDF("doc_id", "simhash", "ts")
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (sig: Long, rows: Iterator[(Long, Long, Timestamp)],
         st: GroupState[SigState]) => {
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            // deterministic first-wins within the batch: the running
            // (event time, doc_id) minimum in ONE pass over the
            // iterator — replay-stable like a sort, but O(1) memory
            // when a template-heavy stream lands 10^6 rows on one hot
            // signature in a single batch (a sort would buffer the
            // whole group); the running max feeds the TTL
            var any = false
            var minTs = Long.MaxValue; var minId = Long.MaxValue
            var minStamp: Timestamp = null
            var maxTs = Long.MinValue
            rows.foreach { r =>
              any = true
              val t = r._3.getTime
              if (t > maxTs) maxTs = t
              if (t < minTs || (t == minTs && r._1 < minId)) {
                minTs = t; minId = r._1; minStamp = r._3
              }
            }
            val kept: Iterator[KeptDoc] =
              if (st.exists || !any) Iterator.empty
              else {
                st.update(SigState(minId))
                Iterator.single(KeptDoc(minId, sig, minStamp))
              }
            if (st.exists && any) {
              // clamp: a replayed/backfilled arrival older than
              // (watermark - ttl) would compute a timeout BEHIND the
              // watermark, and setTimeoutTimestamp throws on that —
              // which would kill the whole ingest query. Late data
              // still gets a state entry; it just expires at the next
              // watermark advance instead of crashing.
              val computed = maxTs + ttlMillis
              st.setTimeoutTimestamp(math.max(computed, st.getCurrentWatermarkMs() + 1))
            }
            kept
          }
        })
  }
}
