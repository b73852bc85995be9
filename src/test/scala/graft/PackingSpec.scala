package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing
import graft.operators.Packing.{PackDoc, PackedDoc}

/** Sequence packing: greedy bin invariants vs a plain sequential fold,
  * and chunk-layout arithmetic consistency. */
class PackingSpec extends SparkSpec {

  /** Single-threaded reference packer: the spec of [[Packing.greedyPack]]. */
  private def referencePack(docs: Seq[PackDoc], capacity: Long): Seq[PackedDoc] =
    docs.groupBy(_.shard).toSeq.flatMap { case (shard, ds) =>
      var bin = 0L; var fill = 0L; var first = true
      ds.sortBy(_.doc_id).map { d =>
        if (first) { first = false; fill = d.tokens }
        else if (fill + d.tokens > capacity) { bin += 1; fill = d.tokens }
        else { fill += d.tokens }
        PackedDoc(d.doc_id, shard, bin, fill - d.tokens, d.tokens)
      }
    }

  private val fixture: Seq[PackDoc] = {
    // deterministic pseudo-random token sizes incl. one oversized doc
    val sizes = (0 until 200).map(i => 1L + (i * 37 % 90)) :+ 999L
    sizes.zipWithIndex.map { case (t, i) => PackDoc(i % 5, i.toLong, t) }
  }

  test("greedyPack matches the sequential fold on every (doc, bin, offset)") {
    import spark.implicits._
    val got = Packing.greedyPack(fixture.toDS().repartition(7), 128L)
      .collect().sortBy(_.doc_id)
    val want = referencePack(fixture, 128L).sortBy(_.doc_id)
    assert(got.toSeq == want)
  }

  test("greedy bins respect capacity except singleton oversized docs") {
    import spark.implicits._
    val packed = Packing.greedyPack(fixture.toDS(), 128L).collect()
    val byBin = packed.groupBy(p => (p.shard, p.bin))
    byBin.foreach { case (_, ds) =>
      val total = ds.map(_.tokens).sum
      assert(total <= 128L || ds.length == 1, s"overfull multi-doc bin: $ds")
    }
    // offsets tile each bin contiguously from 0 in doc_id order
    byBin.foreach { case (_, ds) =>
      val sorted = ds.sortBy(_.doc_id)
      var off = 0L
      sorted.foreach { p => assert(p.bin_off == off); off += p.tokens }
    }
  }

  test("packChunks layout is consistent: offsets contiguous, chunk math exact") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Packing.packChunks(docs, 8, 512L).cache()
    try {
      // start offsets within a shard tile the concatenated stream exactly
      val rows = out.select("shard", "doc_id", "tokens", "start_off", "first_chunk", "last_chunk", "n_chunks")
        .collect().groupBy(_.getLong(0))
      rows.foreach { case (_, rs) =>
        var off = 0L
        rs.sortBy(_.getLong(1)).foreach { r =>
          assert(r.getLong(3) == off)
          assert(r.getLong(4) == off / 512L)
          assert(r.getLong(5) == (off + r.getLong(2) - 1) / 512L)
          assert(r.getLong(6) == r.getLong(5) - r.getLong(4) + 1)
          off += r.getLong(2)
        }
      }
      // no unpartitioned window: the plan must not funnel to a single partition
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"), plan)
    } finally { out.unpersist(); () }
  }

  test("pack_mix histogram conserves chunks and memberships vs packChunks") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
    val placed = Packing.packChunks(docs, 8, 512L)
      .select("shard", "first_chunk", "last_chunk", "n_chunks").collect()
    val mix = Packing.qPackMix(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"),
        r.getAs[Long]("n_chunks")))
    // total memberships: sum over cells of n_docs·n_chunks = Σ doc n_chunks
    assert(mix.map(c => c._1 * c._3).sum === placed.map(_.getLong(3)).sum)
    // total chunks: every (shard, chunk) counted once
    val chunks = placed.flatMap(r =>
      (r.getLong(1) to r.getLong(2)).map(c => (r.getLong(0), c))).toSet
    assert(mix.map(_._3).sum === chunks.size.toLong)
    // a chunk never has more sources than documents, and both ≥ 1
    mix.foreach { case (nd, ns, _) => assert(ns >= 1L && ns <= nd) }
    // packing does mix: some chunk holds >1 document at this sf
    assert(mix.exists(_._1 > 1L))
  }

  test("curriculum plan: phases replay from a brute histogram; whole buckets only") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).count(_ == ' ').toLong + 1L)) // wsTokens
    val got = Packing.qCurriculumPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("cum_docs"),
          r.getAs[Long]("phase")))).toMap
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val n = rows.length.toLong
      val hist = rows.groupBy(t => 64 - java.lang.Long.numberOfLeadingZeros(t._2))
        .view.mapValues(_.size.toLong).toMap
      var cum = 0L
      hist.keys.toSeq.sorted.foreach { b =>
        val exp = (hist(b), cum + hist(b), cum * 4 / n)
        assert(got((src, b.toLong)) == exp, s"$src bucket $b")
        cum += hist(b)
      }
      // final cumulative covers the source; phases only move forward
      assert(cum == n)
      val phases = hist.keys.toSeq.sorted.map(b => got((src, b.toLong))._3)
      assert(phases == phases.sorted)
      phases.foreach(p => assert(p >= 0L && p <= 3L))
    }
  }

  test("shard assignment is content-determined and stable under repartition") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Packing.packChunks(docs, 8, 512L).select("doc_id", "shard", "start_off")
    val b = Packing.packChunks(docs.repartition(11), 8, 512L).select("doc_id", "shard", "start_off")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("pad waste: exact ceil-padding replay; waste monotone in width") {
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select(Packing.wsTokens(org.apache.spark.sql.functions.col("text")))
      .collect().map(_.getLong(0))
    val got = Packing.qPadWaste(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("total_padded"), r.getAs[Long]("waste_permille"))))
    assert(got.map(_._1).toSeq === Seq(64L, 128L, 256L, 512L))
    got.foreach { case (w, (nd, tt, tp, wp)) =>
      assert(nd === toks.length.toLong)
      assert(tt === toks.sum)
      val padded = toks.map(t => (t + w - 1) / w * w).sum
      assert(tp === padded, s"w=$w")
      assert(wp === (padded - toks.sum) * 1000 / padded, s"w=$w")
    }
    // wider buckets never waste less (ceil to a coarser grid)
    val wastes = got.map(_._2._4)
    assert(wastes.sliding(2).forall(p => p(0) <= p(1)))
  }
}
