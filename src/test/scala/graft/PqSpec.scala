package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product-quantization semantics the sf oracle gate can't isolate:
  * the zero-quantization-error regime (ADC must equal exact search)
  * and the plan contract (broadcast codebook/LUT, no cartesian). */
class PqSpec extends SparkSpec {

  import spark.implicits._

  /** embeddings.parquet fixture from explicit 64-dim vectors. */
  private def writeEmb(vecs: Seq[Array[Float]]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def rndVec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(64)((r.nextFloat() - 0.5f) * 0.8f)
  }

  test("zero quantization error: ADC answer equals exact search, recall 100") {
    // 8 centroid seeds (vec_id 0-7), then 8 corpus vectors each STITCHED
    // from whole 16-dim subspaces of the seeds — every subvector is in
    // the codebook, so encoding is lossless and ADC = exact L2².
    val seeds = (0 until 8).map(rndVec)
    val stitched = (0 until 8).map { j =>
      val parts = (0 until 4).map(sub => seeds((j + sub + 1) % 8).slice(sub * 16, sub * 16 + 16))
      parts.flatten.toArray
    }
    val dir = writeEmb(seeds ++ stitched)
    val recall = Similarity.qPqRecall(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(recall.keySet === Set(0L, 1L, 2L))
    assert(recall.values.forall(_ == 100L), recall)
  }

  test("quantized regime: pq output is well-formed, ranks strictly ordered") {
    val dir = writeEmb((0 until 40).map(rndVec))
    val rows = Similarity.qPqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 9) // 3 queries × top-3
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq === Seq(1L, 2L, 3L))
      // adc non-decreasing in rank
      assert(g.sortBy(_._3).map(_._4).toSeq == g.map(_._4).sorted.toSeq)
    }
    // a query never returns itself
    assert(rows.forall(r => r._1 != r._2))
  }

  test("plan: broadcast codebook and LUT, no cartesian/BNLJ") {
    val dir = writeEmb((0 until 40).map(rndVec))
    val plan = Similarity.qPqTopk(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
