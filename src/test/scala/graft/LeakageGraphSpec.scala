package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, Selection, TextStats}

/** Invariants of the split-leakage audit, rank normalization,
  * PageRank step, and lang-id confusion rollup (sf0.001 fixtures). */
class LeakageGraphSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pagerank step conserves mass up to flooring; uniform start") {
    val r = Graphs.qPagerankStep(spark, sf).collect()
    assert(r.nonEmpty)
    val n = r.length
    r.foreach(x => assert(x.getAs[Long]("pr0_micro") === 1000000L / n))
    // Σ pr1 = teleport mass + damped mass, both ≤ 1, off only by
    // per-term floors: within n·(edges-ish) micros below 1.0
    val total = r.map(_.getAs[Long]("pr1_micro")).sum
    assert(total <= 1000000L)
    assert(total >= 1000000L - 200L) // ≤ ~N·|V| floor losses
    // every node keeps at least the teleport share
    r.foreach(x => assert(x.getAs[Long]("pr1_micro") >= 150000L / n * 1))
  }

  test("dup triangles: count matches the neighbor-intersection formulation") {
    val r = Graphs.qDupTriangles(spark, sf).collect()
    assert(r.length === 1)
    val x = r.head
    val nEdges = x.getAs[Long]("n_edges")
    val nTri = x.getAs[Long]("n_triangles")
    val nWedges = x.getAs[Long]("n_wedges")
    val closure = x.getAs[Long]("closure_permille")
    assert(nEdges === graft.operators.Dedup.minhashCandidatePairs(spark, sf).count())
    assert(3 * nTri <= nWedges) // every triangle contains 3 of the wedges
    assert(closure >= 0 && closure <= 1000)
    // independent recount: undirected adjacency, per-edge common
    // neighbors; each triangle is seen from its 3 edges
    val e = graft.operators.Dedup.minhashCandidatePairs(spark, sf)
      .select(col("a"), col("b")).localCheckpoint()
    val adj = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    val common = e.as("ed")
      .join(adj.as("na"), col("ed.a") === col("na.a"))
      .join(adj.as("nb"),
        col("ed.b") === col("nb.a") && col("na.b") === col("nb.b"))
      .count()
    assert(nTri === common / 3, s"tri=$nTri common=$common")
  }

  test("assortativity replays exactly from a BigInt census and stays in [-1,1]") {
    val edges = graft.operators.Dedup.minhashCandidatePairs(spark, sf)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = BigInt(edges.length)
    val s1 = edges.map { case (a, b) => BigInt(deg(a)) + deg(b) }.sum
    val s2 = edges.map { case (a, b) =>
      BigInt(deg(a)) * deg(a) + BigInt(deg(b)) * deg(b) }.sum
    val sjk = edges.map { case (a, b) => BigInt(deg(a)) * deg(b) }.sum
    val den = 2 * m * s2 - s1 * s1
    val expected =
      if (den > 0) ((4 * m * sjk - s1 * s1 + den) * 1000 / den - 1000).toLong
      else 0L
    val row = Graphs.qAssortativity(spark, sf).collect().head
    assert(row.getAs[Long]("n_edges") === edges.length.toLong)
    assert(row.getAs[Long]("assort_permille") === expected)
    assert(expected >= -1000L && expected <= 1000L)
  }

  test("clustering coeff: bands conserve nodes/triangles; cc bounded by clique") {
    val bands = Graphs.qClusteringCoeff(spark, sf).collect()
    assert(bands.nonEmpty)
    val tri = Graphs.qDupTriangles(spark, sf).collect().head
    // node and wedge mass conserve against the census
    assert(bands.map(_.getAs[Long]("n_nodes")).sum === tri.getAs[Long]("n_nodes"))
    assert(bands.map(_.getAs[Long]("n_wedges")).sum === tri.getAs[Long]("n_wedges"))
    // each triangle closes one wedge at each of its 3 member nodes
    assert(bands.map(_.getAs[Long]("n_closed")).sum ===
      3 * tri.getAs[Long]("n_triangles"))
    bands.foreach { b =>
      val (cl, wd, cc) = (b.getAs[Long]("n_closed"), b.getAs[Long]("n_wedges"),
        b.getAs[Long]("cc_permille"))
      assert(cl <= wd)                    // closed wedges are wedges
      assert(cc >= 0 && cc <= 1000)
      if (wd > 0) assert(cc === cl * 1000 / wd)
      // band 1 is degree-1 nodes: no wedges, no triangles possible
      if (b.getAs[Long]("band") === 1L) assert(wd === 0L && cl === 0L)
    }
  }

  test("split leakage only reports duplicated fingerprints; flag matches counts") {
    val r = Selection.qSplitLeakage(spark, sf).collect()
    r.foreach { x =>
      val (tr, va, te) = (x.getAs[Long]("n_train"), x.getAs[Long]("n_val"),
        x.getAs[Long]("n_test"))
      assert(tr + va + te > 1)
      assert(x.getAs[Long]("leaked") ===
        (if (tr > 0 && (va > 0 || te > 0)) 1L else 0L))
    }
    // the fixture corpus has exact duplicates, so the audit must be
    // non-vacuous
    assert(r.nonEmpty)
  }

  test("score normalization spans 0..1000 per source and is a bijection on ranks") {
    val r = Selection.qScoreNormalize(spark, sf).collect()
    val bySrc = r.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rn")).sorted
      assert(ranks.toSeq === (1L to rs.length.toLong))
      assert(rs.map(_.getAs[Long]("permille")).min === 0L)
      if (rs.length > 1)
        assert(rs.map(_.getAs[Long]("permille")).max === 1000L)
    }
  }

  test("lang confusion cells sum to the corpus and row shares to ~1000") {
    val r = TextStats.qLangConfusion(spark, sf).collect()
    val total = r.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(spark, sf).count())
    r.groupBy(_.getAs[String]("lang")).foreach { case (_, cells) =>
      val share = cells.map(_.getAs[Long]("share_permille")).sum
      // integer floors: within |cells| of 1000
      assert(share <= 1000L && share >= 1000L - cells.length)
    }
  }

  test("harmonic centrality replays from a brute BFS over the spine") {
    val edges = graft.operators.Dedup.minhashCandidatePairs(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val got = graft.operators.Graphs.qHarmonicCentrality(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_dist2"),
          r.getAs[Long]("hc_permille")))).toMap
    assert(got.keySet === adj.keySet)
    adj.foreach { case (v, nbrs) =>
      val two = nbrs.flatMap(adj(_)) - v -- nbrs
      val (deg, n2, hc) = got(v)
      assert(deg === nbrs.size.toLong, s"deg($v)")
      assert(n2 === two.size.toLong, s"n2($v)")
      assert(hc === 1000L * nbrs.size + 500L * two.size, s"hc($v)")
    }
    // radius-2 harmonic dominates degree; equality iff no 2-hop shell
    got.values.foreach { case (deg, n2, hc) =>
      assert(hc >= 1000L * deg && (n2 > 0 || hc == 1000L * deg))
    }
  }
}
