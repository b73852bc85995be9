package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Pins [[Similarity.qHnswSearch]]'s walk semantics on planted
  * fixtures (the sf replay only proves oracle agreement; these prove
  * the rules are the INTENDED ones). */
class HnswSpec extends SparkSpec {

  import spark.implicits._

  private def writeEmb(vecs: Seq[Array[Float]]): String = {
    val dir = java.nio.file.Files.createTempDirectory("hnsw").toString
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def rndVec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(64)((r.nextFloat() - 0.5f) * 0.8f)
  }

  test("fully-connected fixture: every probe walks home, recall exactly 1000") {
    // 9 distinct vectors: layer-0 out-degree is 8, so EVERY node's
    // out-edges cover all 8 others — the entry's first layer-0 hop
    // offers every probe its own node, the self-score (+inf) absorbs
    // it there, and the settled node's neighborhood IS the whole
    // corpus. Independent of which md5 levels the ids draw:
    //   settled == probe for all probes, recall == 1000.
    val dir = writeEmb((0 until 9).map(rndVec))
    val rows = Similarity.qHnswSearch(spark, dir).collect()
    assert(rows.length === 9)
    assert(rows.forall(r => r.getLong(1) == r.getLong(0)),
      "every probe must settle on its own node (self-score absorption)")
    assert(rows.forall(_.getLong(2) == 3L), "top-3 must all be truth hits")
    assert(rows.forall(_.getLong(3) == 1000L), "recall@3 must be exactly 1000")
  }

  test("island fixture: a probe whose cluster the walk cannot reach scores zero") {
    // two tight, far-apart clusters of 9 (out-degree 8 = exactly the
    // fellow-member count, so layer-0 edges cover a cluster fully but
    // NEVER leave it: same-cluster sims ~1, cross-cluster ~-1).
    // Cluster A is built to contain the entry AND every upper-layer
    // node (membership is assigned from the REAL md5 level rule, so
    // the premise holds by construction): upper-layer hops stay in A,
    // the first layer-0 hop from any A node offers all of A, so
    //   A-probes walk home (self-score) and find their full top-3
    //     (their truth neighbors are fellow A members);
    //   B-probes can never be offered a B node — stranded in island
    //     A with zero hits.
    // This is the island semantics the per-layer out-degrees exist to
    // mitigate (see the operator's edge-builder comment) — pinned
    // here deterministically.
    val n = 18
    val lvls = spark.range(0, n.toLong)
      .select(col("id"),
        graft.functions.Exprs.md5Long(
          concat(lit("hnsw|"), col("id").cast("string"))).as("u"))
      .withColumn("lvl",
        expr(Seq(144115188075855872L, 18014398509481984L, 2251799813685248L)
          .map(t => s"CAST(u < ${t}L AS INT)").mkString(" + ")))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // A = the 9 ids with the highest (lvl, -id) — contains every
    // upper-layer node as long as fewer than 10 of 18 draw lvl >= 1
    val aIds = (0L until n.toLong).sortBy(i => (-lvls(i), i)).take(9).toSet
    assume((0L until n.toLong).filter(i => lvls(i) >= 1).forall(aIds),
      "fixture premise: more than 9 upper-layer draws — enlarge n")
    val base = rndVec(999).map(_ * 0.05f)
    def jitter(seed: Int, sign: Float): Array[Float] = {
      val r = new scala.util.Random(seed)
      val v = base.clone()
      v(0) = sign * 10f // dominant coordinate splits the clusters
      v(1) += (r.nextFloat() - 0.5f) * 0.01f
      v(2 + seed % 32) += (r.nextFloat() - 0.5f) * 0.01f
      v
    }
    val vecs = (0 until n).map(i =>
      jitter(i, if (aIds(i.toLong)) 1f else -1f))
    val dir = writeEmb(vecs)
    val byProbe = Similarity.qHnswSearch(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byProbe.size === n)
    aIds.foreach { p =>
      assert(byProbe(p)._1 == p, s"A-probe $p must walk home")
      assert(byProbe(p)._2 == 3L, s"A-probe $p must find its full top-3")
    }
    (0L until n.toLong).filterNot(aIds).foreach { p =>
      assert(aIds(byProbe(p)._1), s"B-probe $p must be stranded in island A")
      assert(byProbe(p)._2 == 0L, s"B-probe $p finds no truth neighbor")
    }
  }
}
