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

  test("pq_train: stitched vectors assign at distance zero; stats reproduce centroids") {
    // seeds 0-7: vec j = constant (j+1)/16 everywhere (exact binary
    // fractions — float-faithful through the DECIMAL(12,8) cast).
    // Corpus vectors 8-9 copy WHOLE 8-dim subspaces from seeds (8: all
    // from seed 2; 9: alternating seeds 0/1 per subspace) → every
    // assignment is d2 = 0 to the copied seed, and the per-(subspace,
    // cid, sdim) sums are exact multiples of the seed coordinate.
    val seeds = (0 until 8).map(j => Array.fill(64)((j + 1) / 16.0f))
    val v8 = Array.fill(64)(0.1875f)                // = seed 2
    val v9 = (0 until 64).map(i =>
      if ((i / 8) % 2 == 0) 0.0625f else 0.125f).toArray
    val dir = writeEmb(seeds ++ Seq(v8, v9))
    val r = Similarity.qPqTrain(spark, dir).collect()
      .map(x => (x.getAs[Long]("subspace"), x.getAs[Long]("cid"),
        x.getAs[Long]("sdim")) ->
        ((x.getAs[Long]("n"), x.getAs[Long]("sum_unscaled")))).toMap
    // each (subspace, sdim) slot partitions all 10 vectors
    (0L until 8L).foreach { m =>
      assert(r.collect { case ((s0, _, sd), (n, _)) if s0 == m && sd == 1 => n }
        .sum == 10L)
    }
    // seed 2 hosts itself + v8 in every subspace: n = 2, sum = 2·0.1875e8
    (0L until 8L).foreach { m =>
      assert(r((m, 2L, 1L)) == ((2L, 37500000L)), r((m, 2L, 1L)).toString)
    }
    // v9: even subspaces join seed 0 (0.0625), odd join seed 1 (0.125)
    assert(r((0L, 0L, 1L)) == ((2L, 12500000L)))
    assert(r((1L, 1L, 1L)) == ((2L, 25000000L)))
    assert(r((1L, 0L, 1L))._1 == 1L) // seed 0 alone in odd subspaces
  }

  test("cluster_purity: planted mixed-label cluster scores its exact majority share") {
    // seeds 0-7 = centroids on ORTHOGONAL basis axes (cosine between
    // any two seeds is 0 — constant vectors would all be parallel
    // under cosine and collapse into cluster 0), each its own cluster,
    // label = its id. Vectors 8-10 EQUAL seed 2 (cos = 1) with labels
    // 2, 2, 5 → cluster 2 holds {2:3, 5:1}: purity 750.
    val dir = java.nio.file.Files.createTempDirectory("purity").toString
    def axis(j: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(j) = 1.0f; a
    }
    val rows = (0 until 8).map(j => (j.toLong, axis(j), j)) ++
      Seq((8L, axis(2), 2), (9L, axis(2), 2), (10L, axis(2), 5))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.qClusterPurity(spark, dir).collect()
      .map(x => x.getAs[Long]("cid") ->
        ((x.getAs[Long]("n"), x.getAs[Long]("top_label"),
          x.getAs[Long]("n_top"), x.getAs[Long]("purity_permille")))).toMap
    assert(r(2L) == ((4L, 2L, 3L, 750L)), r(2L).toString)
    // every pure singleton cluster scores 1000 with its own label
    (0L until 8L).filter(_ != 2L).foreach { c =>
      assert(r(c) == ((1L, c, 1L, 1000L)), s"cid $c: ${r(c)}")
    }
  }

  test("silhouette: exact members score 1000, equidistant tie scores 0") {
    // Orthogonal-axis seeds 0-7; vec 8 EQUALS seed 2 (sim1 = 10⁶,
    // sim2 = 0 → margin 1000); vec 9 = (e2+e3)/√2 sits EXACTLY between
    // centroids 2 and 3 (sim1 = sim2, tie assigns the lower cid) →
    // margin 0, the thin-boundary point the diagnostic exists to find.
    def axis(j: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(j) = 1.0f; a
    }
    val mid = { val a = Array.fill(64)(0.0f)
      a(2) = 0.70710678f; a(3) = 0.70710678f; a }
    val dir = writeEmb((0 until 8).map(axis) ++ Seq(axis(2), mid))
    val r = Similarity.qSilhouette(spark, dir).collect()
      .map(x => x.getAs[Long]("cid") ->
        ((x.getAs[Long]("n"), x.getAs[Long]("mean_sil_permille"),
          x.getAs[Long]("min_sil_permille")))).toMap
    // cluster 2: seed + exact copy (1000 each) + the tie point (0)
    assert(r(2L) == ((3L, 666L, 0L)), r(2L).toString)
    (0L until 8L).filter(_ != 2L).foreach { c =>
      assert(r(c) == ((1L, 1000L, 1000L)), s"cid $c: ${r(c)}")
    }
    // margins are permille-bounded and n conserves the corpus
    assert(r.values.map(_._1).sum == 10L)
    r.values.foreach { case (_, m, mn) =>
      assert(mn >= 0L && mn <= m && m <= 1000L) }
  }

  test("spectral_power replays from BigInt floor-division; anisotropy endpoints") {
    // v0 = 0.5·ones (the planted common direction), v1 = −e1, v2 = e2.
    // dim 1's coordinate sum is −5e7 over n = 3 — floor(−5e7/3) ≠
    // trunc(−5e7/3), so this pins the additive-shift floor on
    // negatives, not just the happy path.
    val v0 = Array.fill(64)(0.5f)
    val v1 = { val a = Array.fill(64)(0.0f); a(0) = -1.0f; a }
    val v2 = { val a = Array.fill(64)(0.0f); a(1) = 1.0f; a }
    val vecs = Seq(v0, v1, v2)
    val dir = writeEmb(vecs)
    val u = vecs.map(_.map(x => BigInt((BigDecimal(x.toDouble) *
      BigDecimal(100000000)).toBigIntExact.get.toLong)))
    val sv = u.map(_.sum)
    val ss = sv.map(s => s * s).sum
    val tot = u.map(_.map(x => x * x).sum).sum
    val expAniso = ((ss * 1000) / (64 * tot)).toLong
    def floorDiv(a: BigInt, b: BigInt): BigInt =
      if (a.sign * b.sign < 0 && a % b != 0) a / b - 1 else a / b
    val n = BigInt(vecs.length)
    val got = Similarity.qSpectralPower(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("mean_u"),
          r.getAs[Long]("w_avg"), r.getAs[Long]("aniso_permille")))).toMap
    assert(got.size === 64)
    (0 until 64).foreach { d =>
      val su = u.map(_(d)).sum
      val w = u.indices.map(i => sv(i) * u(i)(d)).sum
      val exp = (n.toLong, floorDiv(su, n).toLong, floorDiv(w, n).toLong,
        expAniso)
      assert(got((d + 1).toLong) == exp, s"dim ${d + 1}")
    }
    // a pure common-direction cloud is fully anisotropic: share = 1000
    val dirPure = writeEmb(Seq.fill(4)(v0))
    val pure = Similarity.qSpectralPower(spark, dirPure).collect().head
    assert(pure.getAs[Long]("aniso_permille") === 1000L)
  }

  test("nn_descent: one round recovers a far-id twin the seed window misses") {
    // v0, v1, v4, v7 share one direction; v2, v3, v5, v6 are orthogonal
    // fillers. v0's truth top-3 = {1, 4, 7} but its ±3-id seed window
    // only reaches {1, 2, 3} (1 hit). v1's seed holds 4, so the descent
    // step routes 4 to v0 through their shared edge — recall must rise.
    def axis(j: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(j) = 1.0f; a
    }
    val u = axis(0)
    val vecs = Seq(u, u, axis(1), axis(2), u, axis(3), axis(4), u)
    val dir = writeEmb(vecs)
    val r = Similarity.qNnDescent(spark, dir).collect()
      .map(x => x.getAs[Long]("stage") ->
        ((x.getAs[Long]("n_queries"), x.getAs[Long]("n_hits"),
          x.getAs[Long]("recall_permille")))).toMap
    assert(r.keySet === Set(0L, 1L))
    assert(r(0L)._1 === 8L && r(1L)._1 === 8L)
    // adding candidates under the same exact ordering never loses a
    // truth hit (anything displacing a truth member IS a truth member)
    assert(r(1L)._2 > r(0L)._2, r.toString)
    assert(r(1L)._3 > r(0L)._3)
    r.values.foreach { case (_, _, p) => assert(p >= 0L && p <= 1000L) }
  }

  test("mutual knn: reciprocal pairs form exactly the K4 core of the hub fixture") {
    // Same geometry as the hubness fixture: hub 0 = e1, satellites
    // 1-5 = e1 + 0.5·e_{i+1}. Hub↔sat cos = .894427, sat↔sat = .800000;
    // ties break to lowest id, so hub's top-3 = {1,2,3} and every
    // satellite's = {hub} ∪ two lowest other sats. Reciprocity keeps
    // exactly the K4 on {0,1,2,3} — satellites 4,5 point IN but nobody
    // points back (the hub-pollution the reciprocal filter removes).
    val hub = { val a = Array.fill(64)(0.0f); a(0) = 1.0f; a }
    val sats = (1 to 5).map { i =>
      val a = Array.fill(64)(0.0f); a(0) = 1.0f; a(i) = 0.5f; a }
    val dir = writeEmb(hub +: sats)
    val got = Similarity.qMutualKnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("sim_micros"))
      .toMap
    val expected = Map(
      (0L, 1L) -> 894427L, (0L, 2L) -> 894427L, (0L, 3L) -> 894427L,
      (1L, 2L) -> 800000L, (1L, 3L) -> 800000L, (2L, 3L) -> 800000L)
    assert(got === expected, got.toString)
  }

  test("hubness: histogram conserves vectors and edges; hubs and antihubs split") {
    // hub 0 = e1; satellites 1-5 = e1 + 0.5·e_{i+1}. Every satellite's
    // top-1 is the hub (sim .894 vs .8 satellite-satellite); satellite
    // ties break to the LOWEST id, so everyone's remaining two picks
    // are satellites 1-2 — making 0, 1, 2 co-hubs (k_occ = 5 = n−1),
    // satellite 3 middling (hub + sats 1, 2 pick it), and 4, 5
    // antihubs (k_occ = 0). Exactly the asymmetric-neighbor skew the
    // diagnostic exists to expose, pinned end-to-end:
    val hub = { val a = Array.fill(64)(0.0f); a(0) = 1.0f; a }
    val sats = (1 to 5).map { i =>
      val a = Array.fill(64)(0.0f); a(0) = 1.0f; a(i) = 0.5f; a }
    val dir = writeEmb(hub +: sats)
    val hist = Similarity.qHubness(spark, dir).collect()
      .map(x => x.getAs[Long]("k_occurrence") -> x.getAs[Long]("n_vectors"))
      .toMap
    assert(hist.values.sum == 6L)                              // vectors conserve
    assert(hist.map { case (k, n) => k * n }.sum == 18L)       // 6 queries × k=3 edges
    assert(hist == Map(0L -> 2L, 3L -> 1L, 5L -> 3L), hist.toString)
  }
}
