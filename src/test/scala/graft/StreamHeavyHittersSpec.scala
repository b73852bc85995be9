package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamHeavyHitters
import graft.streaming.StreamHeavyHitters.Ev

/** Streaming SpaceSaving heavy hitters: exact-regime parity with a
  * batch groupBy count, the over-capacity guarantee (dominant key
  * present, count bracketed by its overestimate bound), bounded state,
  * and cross-batch accumulation. */
class StreamHeavyHittersSpec extends SparkSpec {

  private val t0 = 1700000000L
  private def ts(off: Long) = new Timestamp((t0 + off) * 1000)

  private def run(batches: Seq[Seq[Ev]], capacity: Int, nShards: Int,
      name: String): Map[(Int, String), (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamHeavyHitters.heavyHitters(input.toDS(), capacity, nShards)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // update mode re-emits a shard's table each batch: keep the LAST
      // emission per (shard, key) — max cnt is correct because counts
      // only grow
      spark.table(name).collect()
        .map(r => (r.getInt(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3))))
        .groupBy(_._1).view
        .mapValues(_.map(_._2).maxBy(_._1)).toMap
    } finally { q.stop() }
  }

  test("exact regime: counts equal a batch groupBy, err = 0, across batches") {
    val keys = Seq("a", "b", "c", "d")
    val b1 = keys.zipWithIndex.flatMap { case (k, i) =>
      Seq.fill(i + 1)(Ev(k, ts(i))) }              // a:1 b:2 c:3 d:4
    val b2 = Seq(Ev("a", ts(10)), Ev("d", ts(11))) // a:2 d:5
    val got = run(Seq(b1, b2), capacity = 8, nShards = 2, name = "hh_exact")
    val trueCounts = Map("a" -> 2L, "b" -> 2L, "c" -> 3L, "d" -> 5L)
    trueCounts.foreach { case (k, n) =>
      val shard = StreamHeavyHitters.shardOf(k, 2)
      assert(got((shard, k)) == ((n, 0L)), s"key $k")
    }
    // no key ever lands outside its deterministic shard
    got.keys.foreach { case (s, k) =>
      assert(s == StreamHeavyHitters.shardOf(k, 2)) }
  }

  test("over capacity: dominant key survives, bound brackets truth, state bounded") {
    // one shard so eviction pressure is real: capacity 2, keys hot(10),
    // warm(3), then 4 distinct one-off keys churning the second slot
    val hot = Seq.fill(10)(Ev("hot", ts(0)))
    val warm = Seq.fill(3)(Ev("warm", ts(1)))
    val churn = Seq("x1", "x2", "x3", "x4").map(k => Ev(k, ts(2)))
    val got = run(Seq(hot ++ warm ++ churn), capacity = 2, nShards = 1,
      name = "hh_over")
    // table never exceeds capacity
    assert(got.size <= 2)
    // the dominant key is guaranteed present (true count 10 > N/cap)
    val (hc, he) = got((0, "hot"))
    assert(hc - he <= 10L && 10L <= hc, s"hot bracket violated: $hc/$he")
    // every surviving entry brackets its true count
    val truth = Map("hot" -> 10L, "warm" -> 3L, "x1" -> 1L, "x2" -> 1L,
      "x3" -> 1L, "x4" -> 1L)
    got.foreach { case ((_, k), (c, e)) =>
      assert(c - e <= truth(k) && truth(k) <= c, s"key $k: $c/$e")
    }
  }
}
