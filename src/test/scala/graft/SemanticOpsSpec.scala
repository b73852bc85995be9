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

  test("matryoshka overlap: truncation reorders a tail-heavy neighbor, exact ranks") {
    import spark.implicits._
    // hand-computable geometry: for query v0 = e1,
    //   v1 = e1 + 10*e33  → full cos 1/sqrt(101) ≈ .0995, prefix cos 1.0
    //   v2 = e1 + e2      → cos 1/sqrt(2) ≈ .707 under BOTH views
    //   v3 = -e1          → cos -1 both
    //   fillers 8..11 = e3 → cos 0 both
    // full top-1 is v2 but the 32-dim prefix ranks v1 first — so the
    // full winner lands at prefix rank 2, which is the number this
    // operator exists to surface
    def vec(parts: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f)
      parts.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    val rows = Seq(
      (0L, vec(0 -> 1f), 0),
      (1L, vec(0 -> 1f, 32 -> 10f), 0),
      (2L, vec(0 -> 1f, 1 -> 1f), 0),
      (3L, vec(0 -> -1f), 0)) ++
      (8L to 11L).map(id => (id, vec(2 -> 1f), 1))
    val dir = java.nio.file.Files.createTempDirectory("matry").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.qMatryoshkaOverlap(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L) === ((3L, 2L)), s"qid 0 got ${r(0L)}")
    // every query vector reports, overlap is bounded by k
    assert(r.keySet === Set(0L, 1L, 2L, 3L))
    assert(r.values.forall { case (o, _) => o >= 0L && o <= 3L })
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

  test("jl distortion: first pair recomputed exactly with BigInt; mean near 1000") {
    import org.apache.spark.sql.functions._
    val r = Similarity.qJlDistortion(spark, sf).collect()
    val nVec = Tables.embeddings(spark, sf).count()
    assert(r.length === (nVec / 2).toInt)
    // independent exact recount of pair (0, 1) from the raw floats,
    // through the same decimal-grid rule, entirely in BigInt
    val raw = Tables.embeddings(spark, sf).filter(col("vec_id") <= 1)
      .orderBy("vec_id").collect()
      .map(_.getAs[Seq[Float]]("embedding").toArray)
    def u(x: Float): BigInt = // float -> double -> DECIMAL(12,8) -> *1e8
      BigDecimal(x.toDouble).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(100000000L)).toBigInt
    def sign(k: Int, j: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl|$k|$j".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      if (BigInt(hex, 16) % 2 == 0) 1 else -1
    }
    val ua = (1 to 64).map(j => u(raw(0)(j - 1)))
    val ub = (1 to 64).map(j => u(raw(1)(j - 1)))
    val d64 = (0 until 64).map(j => (ua(j) - ub(j)).pow(2)).sum
    val d16 = (0 until 16).map { k =>
      val ya = (1 to 64).map(j => ua(j - 1) * sign(k, j)).sum
      val yb = (1 to 64).map(j => ub(j - 1) * sign(k, j)).sum
      (ya - yb).pow(2)
    }.sum
    val first = r.head
    assert(first.getLong(0) === 0L && first.getLong(1) === 1L)
    // d64_sq/d16_sq leave as plain-notation STRINGS (no-DECIMAL-output
    // contract; d16_sq genuinely exceeds int64)
    assert(BigInt(first.getString(2)) === d64)
    assert(BigInt(first.getString(3)) === d16)
    assert(first.getAs[Long]("distortion_permille") ===
      (d16 * 1000 / (16 * d64)).toLong)
    // JL expectation: distortion centers on 1000; with k=16 the spread
    // is wide per-pair but the mean over 250 pairs concentrates
    val mean = r.map(_.getAs[Long]("distortion_permille")).sum / r.length
    assert(mean > 500 && mean < 2000, s"mean=$mean")
  }
}
