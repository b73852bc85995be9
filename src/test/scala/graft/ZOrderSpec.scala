package graft

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

import graft.functions.ZOrderExpr
import graft.plans.Graft

/** Z-order clustering key: bit-exact vs a naive reference interleave,
  * the locality property that justifies it (z-sorted chunks have small
  * bounding boxes on BOTH axes, lexicographic sort does not), and the
  * SQL registration path.
  */
class ZOrderSpec extends SparkSpec {

  private def naiveInterleave(a: Long, b: Long): Long = {
    var out = 0L
    for (i <- 0 until 31) {
      out |= ((b >> i) & 1L) << (2 * i)
      out |= ((a >> i) & 1L) << (2 * i + 1)
    }
    out
  }

  test("interleave matches the bit-by-bit reference and never goes negative") {
    val cases = Seq(0L, 1L, 2L, 3L, 7L, 255L, 256L, 65535L, 65536L,
      0x7fffffffL, 0x80000000L, 0xffffffffL /* high bits ignored */)
    for (a <- cases; b <- cases) {
      val z = ZOrderExpr.interleave(a, b)
      assert(z === naiveInterleave(a & 0x7fffffffL, b & 0x7fffffffL), s"a=$a b=$b")
      // a 32nd bit would land in the sign position and flip sort order
      // at the halfway boundary — the key must stay non-negative
      assert(z >= 0L, s"a=$a b=$b z=$z")
    }
    // deterministic pseudo-random sweep
    var x = 0x2545f4914f6cdd1dL
    for (_ <- 0 until 500) {
      x = x * 6364136223846793005L + 1442695040888963407L
      val a = (x >>> 32) & 0x7fffffffL; val b = x & 0x7fffffffL
      assert(ZOrderExpr.interleave(a, b) === naiveInterleave(a, b))
    }
  }

  test("z-sorted chunks bound BOTH axes; lexicographic sort does not") {
    import spark.implicits._
    val n = 64
    val grid = for (a <- 0L until n; b <- 0L until n) yield (a, b)
    def chunkBoxArea(sorted: Seq[(Long, Long)], chunks: Int): Double = {
      val size = sorted.length / chunks
      sorted.grouped(size).map { c =>
        val (as, bs) = (c.map(_._1), c.map(_._2))
        ((as.max - as.min + 1) * (bs.max - bs.min + 1)).toDouble
      }.sum / chunks
    }
    val zSorted = grid.sortBy { case (a, b) => ZOrderExpr.interleave(a, b) }
    val lexSorted = grid.sortBy(identity)
    val zArea = chunkBoxArea(zSorted, n.toInt)
    val lexArea = chunkBoxArea(lexSorted, n.toInt)
    // each z chunk of 64 cells is an 8x8 box (area 64); each lex chunk
    // is one full column (area 64x1=64 on (a,b)... but spans the WHOLE
    // b range: 1x64). The box AREAS tie on a full grid — the pruning
    // difference is per-axis extent. Assert both axes are bounded for z.
    val zMaxExtentB = zSorted.grouped(n.toInt).map(c => c.map(_._2).max - c.map(_._2).min).max
    val lexMaxExtentB = lexSorted.grouped(n.toInt).map(c => c.map(_._2).max - c.map(_._2).min).max
    assert(zMaxExtentB <= 7, s"z chunks are 8x8 tiles, b-extent $zMaxExtentB")
    assert(lexMaxExtentB === n - 1, "lex chunks span the full b range")
    assert(zArea <= lexArea + 1e-9)

    // the practical consequence: filtering b to one 8-wide band touches
    // 1/8 of the z chunks but EVERY lex chunk
    def chunksTouched(sorted: Seq[(Long, Long)], lo: Long, hi: Long): Int =
      sorted.grouped(n.toInt).count(c => c.exists(p => p._2 >= lo && p._2 <= hi))
    assert(chunksTouched(zSorted, 8, 15) === n / 8)
    assert(chunksTouched(lexSorted, 8, 15) === n)
  }

  test("z-order write layout prunes parquet on the NON-leading column") {
    import spark.implicits._
    val n = 64L
    val grid = (for (a <- 0L until n; b <- 0L until n) yield (a, b)).toDF("a", "b")
    def zc = GraftSqlBridge.column(ZOrderExpr(
      GraftSqlBridge.expression(col("a")), GraftSqlBridge.expression(col("b"))))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // 16 files along the z-curve vs 16 files along plain (a, b) order —
    // same data, different layout
    grid.withColumn("z", zc).repartitionByRange(16, col("z"))
      .sortWithinPartitions("z").drop("z").write.parquet(s"$dir/zsorted")
    grid.repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions("a", "b").write.parquet(s"$dir/lex")

    // rows surviving parquet row-group/min-max pruning = the scan
    // node's output BEFORE the post-scan filter; read it from the
    // scan's numOutputRows metric after running the query
    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("b") >= 8 && col("b") <= 15)
      q.collect()
      val scans = q.queryExecution.executedPlan.collectLeaves()
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val zScanned = scannedRows(s"$dir/zsorted")
    val lexScanned = scannedRows(s"$dir/lex")
    val total = n * n
    // z layout: b is locally bounded per file → most row groups skip.
    // lex layout: every a-slice spans the whole b range → nothing skips.
    assert(lexScanned === total, s"lex layout cannot prune on b: $lexScanned")
    assert(zScanned <= total / 2,
      s"z layout must prune most row groups on b: $zScanned of $total")
  }

  test("works as a Column and as a registered SQL function") {
    import spark.implicits._
    val df = Seq((3L, 5L)).toDF("a", "b")
    val viaColumn = df.select(
      GraftSqlBridge.column(ZOrderExpr(
        GraftSqlBridge.expression(col("a")),
        GraftSqlBridge.expression(col("b"))))).as[Long].head()
    assert(viaColumn === naiveInterleave(3L, 5L))
    Graft.install(spark)
    val viaSql = spark.sql("SELECT z_order(3L, 5L)").as[Long].head()
    assert(viaSql === naiveInterleave(3L, 5L))
    val nullCase = spark.sql("SELECT z_order(CAST(NULL AS BIGINT), 5L)").collect().head
    assert(nullCase.isNullAt(0))
  }
}
