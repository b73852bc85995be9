package graft

import org.apache.spark.sql.functions._

import graft.operators.IndexStats

/** Invariants of the index-layout/cross-modal planning family
  * (sf0.001 fixtures). */
class IndexStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("coverage curve: ranks 1..20, cumulative share monotone and <= 1000") {
    val r = IndexStats.qCoverageCurve(spark, sf).collect()
    assert(r.map(_.getAs[Long]("rank")).toSeq === (1L to 20L))
    val cum = r.map(_.getAs[Long]("cum_permille"))
    assert(cum.toSeq === cum.toSeq.sorted)
    assert(cum.last <= 1000L)
    // frequencies non-increasing down the ranking
    val n = r.map(_.getAs[Long]("n"))
    assert(n.toSeq === n.toSeq.sorted.reverse)
    // cum_n really is the running sum of n
    assert(r.map(_.getAs[Long]("cum_n")).toSeq === n.scanLeft(0L)(_ + _).tail.toSeq)
  }

  test("posting gaps: non-negative gaps, small-share bounded, mean consistent") {
    val r = IndexStats.qPostingGaps(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("n_gaps") >= 2)
      assert(x.getAs[Long]("max_gap") >= 1)
      assert(x.getAs[Long]("small_permille") <= 1000L)
      // mean (micro) is at most the max gap
      assert(x.getAs[Long]("mean_gap_micro") <= x.getAs[Long]("max_gap") * 1000000L)
    }
  }

  test("crossmodal health: per-lang counts conserve the joined id space") {
    val r = IndexStats.qCrossmodalHealth(spark, sf).collect()
    assert(r.nonEmpty)
    val joined = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .join(Tables.embeddings(spark, sf),
        col("doc_id") === col("vec_id")).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum === joined)
    r.foreach { x =>
      assert(x.getAs[Long]("mean_chars") > 0)
      assert(x.getAs[Long]("mean_nrm_u") >= 0)
    }
  }
}
