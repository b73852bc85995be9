package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Structural invariants of the round-7 semantic operator family
  * (q_kmeans_step / q_semdedup / q_knn_classify / q_hybrid_neardup);
  * value-exactness is the DuckDB oracle's job. */
class SemanticOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("kmeans step: 8x64 grid, every vector assigned exactly once, sums finite") {
    val out = Similarity.qKmeansStep(spark, sf).collect()
    assert(out.length == 8 * 64)
    val cids = out.map(_.getLong(0)).distinct.sorted
    assert(cids.sameElements(0L until 8L))
    // per-dim membership totals all equal the corpus size (each vector
    // contributes one component to every dim of exactly one cluster)
    val corpusN = Tables.embeddings(spark, sf).count()
    val perDim = out.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perDim.values.toSet == Set(corpusN), s"per-dim n totals: ${perDim.toMap}")
  }

  test("semdedup: drops are within-cluster, witness is smaller id, sim above threshold") {
    val out = Similarity.qSemdedup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (vecId, keptBy, sim) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(keptBy < vecId, s"witness $keptBy !< dropped $vecId")
      assert(sim >= 300000L)
    }
    // dropped set must not contain every member of any cluster: the
    // smallest id of a cluster can never be dropped by the a<b rule
    val dropped = out.map(_.getLong(0)).toSet
    assert(!dropped.contains(out.map(_.getLong(2)).min))
  }

  test("knn classify: 20 queries, votes within [1,5], labels from the corpus domain") {
    val out = Similarity.qKnnClassify(spark, sf).collect()
    assert(out.length == 20)
    val labels = Tables.embeddings(spark, sf)
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    out.foreach { r =>
      assert(labels.contains(r.getInt(2)), s"pred label ${r.getInt(2)} not in corpus")
      val votes = r.getLong(3)
      assert(votes >= 1L && votes <= 5L)
      assert(r.getLong(4) == (if (r.getInt(1) == r.getInt(2)) 1L else 0L))
    }
  }

  test("hybrid consensus: flags match signal presence, sentinels only when absent") {
    val out = Dedup.qHybridNeardup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lex, sem, ham, sim) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lex == 1L || sem == 1L, "a row with neither signal must not exist")
      if (lex == 1L) assert(ham >= 0L && ham <= 1L) else assert(ham == -1L)
      if (sem == 1L) assert(sim >= 300000L) else assert(sim == -1L)
    }
    // consensus must equal the union of its two source sets, exactly
    val lexN = Dedup.qSimhashNeardup(spark, sf).count()
    val semN = Similarity.qEmbeddingNeardup(spark, sf).count()
    val both = out.count(r => r.getLong(2) == 1L && r.getLong(3) == 1L)
    assert(out.length == lexN + semN - both)
  }
}
