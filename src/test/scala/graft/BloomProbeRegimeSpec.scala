package graft

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Pins the bloom-probe regime switch (ADVICE r16): at or below the
  * literal-size cap the probe embeds the filter bytes as a foldable
  * Literal (the r16 fast path — one resident byte[] per plan); above
  * it the bytes travel as a broadcast variable so each task
  * serializes a handle, not the payload. Both paths share
  * [[graft.functions.BloomUtil.mightContain]], so the filtered row
  * set must be bit-identical — that is what makes the switch a pure
  * ship-cost optimization and not a semantics change.
  */
class BloomProbeRegimeSpec extends SparkSpec {

  test("literal and broadcast bloom probes agree bit-for-bit; regime switches on size") {
    val k = 5
    val words = new Array[Long](1 << 10) // 65536-bit filter
    val evenHashes = spark.range(0, 100, 2)
      .select(xxhash64(col("id")).as("h")).collect().map(_.getLong(0))
    evenHashes.foreach(h => graft.functions.BloomUtil.set(words, h, k))
    val bytes = graft.functions.BloomUtil.toBytes(words)

    val df = spark.range(0, 100).select(col("id"), xxhash64(col("id")).as("h"))
    def run(literalMax: Int): Seq[Long] = {
      val probe = graft.operators.TextStats.bloomProbe(spark, bytes, col("h"), k, literalMax)
      df.filter(probe).select("id").collect().map(_.getLong(0)).sorted.toSeq
    }

    val viaLiteral = run(Int.MaxValue)
    val viaBroadcast = run(0)
    assert(viaLiteral == viaBroadcast,
      "the two probe regimes must filter identically")
    val evens = (0L until 100L by 2).toSeq
    assert(evens.forall(viaLiteral.contains),
      "bloom false negative — impossible by construction")

    // the switch actually switches
    assert(GraftSqlBridge.expression(
      graft.operators.TextStats.bloomProbe(spark, bytes, col("h"), k, Int.MaxValue))
      .isInstanceOf[graft.functions.BloomContainsExpr])
    assert(GraftSqlBridge.expression(
      graft.operators.TextStats.bloomProbe(spark, bytes, col("h"), k, 0))
      .isInstanceOf[graft.functions.BloomContainsBcastExpr])
  }
}
