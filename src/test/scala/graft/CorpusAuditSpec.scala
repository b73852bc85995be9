package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Dedup, Graphs, IndexStats, Packing,
  Profiling, Relevance, Sequences, Similarity, TextStats}

/** Semantic invariants of the corpus-audit additions: event-order /
  * drift statistics (out-of-order watermark audit, lag-1 autocorr,
  * CUSUM changepoint), distribution distances (pairwise KS, Gini),
  * URL/host hygiene (host rollup, keep-best URL dedup), writer layout
  * (shard plan), and the graph/index/rank/embedding queries that
  * landed with them. Where the operator is a decomposition of a
  * sequential definition, the test REPLAYS that definition in plain
  * Scala over the collected sf0.001 rows and demands bit-equality —
  * the strongest check a unit test can make; the DuckDB oracle then
  * re-proves it at sf0.01 from an independent engine.
  */
class CorpusAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ---- event-order family -------------------------------------------------

  test("out_of_order: block decomposition replays the sequential lateness scan") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), expr("ts div 1000").as("ts_us"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (t, es) =>
      var prevmax = Long.MinValue
      var nLate = 0L; var maxLate = 0L; var sumLate = 0L
      es.sortBy(_._2).foreach { case (_, _, ts) =>
        val late = if (prevmax == Long.MinValue || prevmax <= ts) 0L else prevmax - ts
        if (late > 0) nLate += 1
        maxLate = math.max(maxLate, late); sumLate += late
        prevmax = math.max(prevmax, ts)
      }
      t -> ((es.length.toLong, nLate, maxLate, sumLate, nLate * 1000 / es.length))
    }
    val got = Sequences.qOutOfOrder(spark, sf).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
  }

  test("autocorr_lag: exact BigInt replay of the n-scaled estimator") {
    val counts = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts div 1000000000) div 3600").as("hr"))
      .groupBy("event_type", "hr").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = counts.groupBy(_._1).flatMap { case (t, hs) =>
      val cs = hs.sortBy(_._2).map(x => BigInt(x._3))
      val n = BigInt(cs.length); val s = cs.sum
      val dev = cs.map(c => n * c - s)
      val num = dev.init.zip(dev.tail).map { case (a, b) => a * b }.sum
      val den = dev.map(d => d * d).sum
      if (den == 0) None
      else Some(t -> ((cs.length.toLong, cs.map(_.toLong).sum,
        ((num * 1000000) / den).toLong)))
    }
    val got = Sequences.qAutocorrLag(spark, sf).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // Cauchy–Schwarz: |r1| <= 1 up to the truncating div
    assert(got.values.forall(v => math.abs(v._3) <= 1000000L))
  }

  test("cusum_changepoint: permille bounded, cp_day is an observed activity day") {
    val r = Sequences.qCusumChangepoint(spark, sf).collect()
    assert(r.nonEmpty)
    val days = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts div 1000000000) div 86400").as("day"))
      .distinct().collect().map(x => (x.getString(0), x.getLong(1))).toSet
    r.foreach { x =>
      val p = x.getAs[Long]("cusum_permille")
      assert(p >= 0 && p <= 1000)
      assert(days.contains((x.getString(0), x.getAs[Long]("cp_day"))))
      assert(x.getAs[Long]("n_days") >= 1)
    }
  }

  // ---- distribution distances ---------------------------------------------

  test("ks_distance: full pair spine, and one pair replayed exactly in BigInt") {
    val r = Profiling.qKsDistance(spark, sf).collect()
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    assert(r.length === (nSrc * (nSrc - 1) / 2))
    assert(r.forall { x =>
      val p = x.getAs[Long]("ks_permille"); p >= 0 && p <= 1000 })
    // exact replay for the (src0, src1) pair
    val lens = Tables.documents(spark, sf)
      .filter(col("text").isNotNull && col("source").isin("src0", "src1"))
      .select("source", "n_chars").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val a = lens.filter(_._1 == "src0").map(_._2).sorted
    val b = lens.filter(_._1 == "src1").map(_._2).sorted
    val support = (a ++ b).distinct.sorted
    val d = support.map { x =>
      (BigInt(a.count(_ <= x)) * b.length - BigInt(b.count(_ <= x)) * a.length).abs
    }.max
    val want = (d * 1000 / (BigInt(a.length) * b.length)).toLong
    val got = r.find(x => x.getString(0) == "src0" && x.getString(1) == "src1").get
    assert(got.getAs[Long]("ks_permille") === want)
    assert(got.getAs[Long]("n_a") === a.length.toLong)
  }

  test("gini_concentration: bounded, zero on constant weights, one source replayed") {
    val r = Profiling.qGiniConcentration(spark, sf).collect()
    assert(r.forall { x =>
      val g = x.getAs[Long]("gini_permille"); g >= 0 && g < 1000 })
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull && col("source") === "src0")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val sorted = docs.sortBy(x => (x._2, x._1)).map(_._2)
    val n = BigInt(sorted.length); val sw = sorted.map(BigInt(_)).sum
    val siw = sorted.zipWithIndex.map { case (w, i) => BigInt(i + 1) * w }.sum
    val want = ((2000 * siw - 1000 * (n + 1) * sw) / (n * sw)).toLong
    val got = r.find(_.getString(0) == "src0").get.getAs[Long]("gini_permille")
    assert(got === want)
    // constant weights => exactly zero: replay the formula on equal w
    val eq = Seq.fill(7)(BigInt(13))
    val eqSiw = eq.zipWithIndex.map { case (w, i) => BigInt(i + 1) * w }.sum
    assert((2000 * eqSiw - 1000 * BigInt(8) * eq.sum) / (BigInt(7) * eq.sum) === 0)
  }

  // ---- URL / host hygiene -------------------------------------------------

  test("host_rollup: one host per source, conservation against url_dedup") {
    val hosts = CorpusOps.qHostRollup(spark, sf).collect()
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    val nDocs = Tables.documents(spark, sf).count()
    assert(hosts.length === nSrc)
    assert(hosts.forall(_.getString(0).endsWith(".com")))
    assert(hosts.map(_.getAs[Long]("n_docs")).sum === nDocs)
    hosts.foreach { h =>
      assert(h.getAs[Long]("n_urls") <= h.getAs[Long]("n_docs"))
      assert(h.getAs[Long]("collapse_permille") >= 0)
    }
    val dedup = CorpusOps.qUrlDedup(spark, sf)
    assert(hosts.map(_.getAs[Long]("n_urls")).sum === dedup.count())
    assert(dedup.agg(sum("n_docs")).collect()(0).getLong(0) === nDocs)
  }

  test("url_dedup: kept doc is the (n_chars, -doc_id) argmax of its group") {
    // a violation would be a doc in the same canonical group that is
    // strictly longer, or equal-length with a smaller doc_id
    val kept = CorpusOps.qUrlDedup(spark, sf)
      .select(col("canonical_url"), col("kept_doc"), col("kept_chars"))
    val viol = kept.join(
      Tables.documents(spark, sf).select(col("doc_id"), col("n_chars")),
      col("doc_id") === col("kept_doc"))
      .filter(col("n_chars") =!= col("kept_chars"))
    assert(viol.count() === 0)
    // keep-best beats first-wins where lengths differ: kept_chars is the
    // group max, so no group's kept_chars is below its own first doc's
    assert(kept.filter(col("kept_chars") < 0).count() === 0)
  }

  // ---- writer layout ------------------------------------------------------

  test("shard_plan: per-source byte conservation and exact replay of one source") {
    val r = Packing.qShardPlan(spark, sf).collect()
    val totals = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .groupBy("source").agg(sum("n_chars").as("t"), count(lit(1)).as("n"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    val bySrc = r.groupBy(_.getString(0))
    bySrc.foreach { case (s, shards) =>
      assert(shards.map(_.getAs[Long]("bytes")).sum === totals(s)._1)
      assert(shards.map(_.getAs[Long]("n_docs")).sum === totals(s)._2)
      val ids = shards.map(_.getAs[Long]("shard"))
      assert(ids.toSeq === ids.toSeq.sorted)
    }
    // exact replay: recompute src0's shard ids sequentially
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull && col("source") === "src0")
      .select("doc_id", "n_chars").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    var off = 0L
    val want = docs.map { case (id, nc) =>
      val sh = off / 16384L; off += nc; (sh, id, nc) }
      .groupBy(_._1).map { case (sh, xs) =>
        sh -> ((xs.length.toLong, xs.map(_._3).sum, xs.map(_._2).min, xs.map(_._2).max)) }
    val got = bySrc("src0").map(x => x.getAs[Long]("shard") ->
      ((x.getAs[Long]("n_docs"), x.getAs[Long]("bytes"),
        x.getAs[Long]("first_doc"), x.getAs[Long]("last_doc")))).toMap
    assert(got === want)
  }

  // ---- graph / index / rank / embedding additions --------------------------

  test("kcore_prune: round-4 peel is a fixpoint on the fixtures (all degrees >= 2)") {
    val r = Graphs.qKcorePrune(spark, sf).collect()
    assert(r.forall(_.getAs[Long]("deg") >= 2))
    // 2-core nodes are a subset of the candidate-graph nodes
    val cand = operators.Dedup.minhashCandidatePairs(spark, sf)
    val nodes = cand.select(col("a").as("v"))
      .unionAll(cand.select(col("b").as("v"))).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(r.forall(x => nodes.contains(x.getAs[Long]("doc_id"))))
  }

  test("delta_encoding: postings conserved and varint never loses to fixed-8") {
    val r = IndexStats.qDeltaEncoding(spark, sf).collect()
    assert(r.nonEmpty)
    val totPostings = r.map(_.getAs[Long]("n_postings")).sum
    val truth = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"), col("doc_id"))
      .filter(length(col("w")) >= 3).distinct().count()
    assert(totPostings === truth)
    r.foreach { x =>
      assert(x.getAs[Long]("varint_bytes") <= x.getAs[Long]("fixed_bytes"))
      assert(x.getAs[Long]("ratio_permille") <= 1000)
    }
  }

  test("rank_overlap: n_overlap monotone in k and bounded by k") {
    val r = Relevance.qRankOverlap(spark, sf).collect().sortBy(_.getAs[Long]("k"))
    assert(r.map(_.getAs[Long]("k")).toSeq === Seq(1L, 5L, 10L, 20L))
    val o = r.map(_.getAs[Long]("n_overlap"))
    assert(o.toSeq === o.toSeq.sorted)
    r.foreach { x =>
      assert(x.getAs[Long]("n_overlap") <= x.getAs[Long]("k"))
      assert(x.getAs[Long]("jaccard_permille") <= 1000)
    }
  }

  test("embedding_outliers: deterministic top-20, ratios ordered and nonnegative") {
    val a = Similarity.qEmbeddingOutliers(spark, sf).collect()
    val b = Similarity.qEmbeddingOutliers(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.length === 20)
    val ratios = a.map(_.getAs[Long]("ratio_permille"))
    assert(ratios.toSeq === ratios.sorted.reverse.toSeq)
    assert(ratios.forall(_ >= 0) && a.forall(_.getAs[Long]("dist2_e16") >= 0))
    // an outlier is above its label mean by construction of the screen
    assert(ratios.head >= 1000)
  }

  test("market_share: share bounded, totals conserved against an independent rewrite") {
    val r = operators.Reports.qMarketShare(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("nation_e4") <= x.getAs[Long]("total_e4"))
      val p = x.getAs[Long]("share_permille"); assert(p >= 0 && p <= 1000)
    }
    // independent rewrite: semi-join the ASIA customers instead of the
    // dimension chain, sum the same exact decimal revenue
    val li = Tables.lineitem(spark, sf); val ord = Tables.orders(spark, sf)
    val asia = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_regionkey") === 2).select("c_custkey")
    val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(asia, Seq("c_custkey").map(c => col("o_custkey") === col(c)).head, "left_semi")
      .agg(graft.functions.Exprs.intScaled(
        sum(graft.functions.Exprs.dec2(col("l_extendedprice"))
          * graft.functions.Exprs.dec2(lit(1) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)), 10000L))
      .collect()(0).getLong(0)
    assert(r.map(_.getAs[Long]("total_e4")).sum === want)
  }

  test("power_iteration: 64 components, abs-max lands exactly at 1000 permille") {
    val r = Similarity.qPowerIteration(spark, sf).collect()
    assert(r.length === 64)
    assert(r.map(_.getAs[Long]("dim")).toSeq === (1L to 64L))
    val comps = r.map(_.getAs[Long]("component_permille"))
    assert(comps.forall(c => c >= -1000 && c <= 1000))
    assert(comps.map(math.abs).max === 1000)
    // n_vecs is the same for every dimension (each vector contributes
    // to all 64 dims)
    assert(r.map(_.getAs[Long]("n_vecs")).distinct.length === 1)
  }

  test("column_entropy: nonnegative, bounded by log2 cardinality, equal row counts") {
    val r = Profiling.qColumnEntropy(spark, sf).collect()
    assert(r.length === 4)
    val n = r.map(_.getAs[Long]("n_values")).distinct
    assert(n.length === 1) // every column profiled over the same rows
    r.foreach { x =>
      val h = x.getAs[Long]("entropy_milli")
      val k = x.getAs[Long]("n_distinct")
      assert(h >= 0)
      assert(h <= math.ceil(1000.0 * math.log(k.toDouble) / math.log(2.0)).toLong)
    }
  }

  test("seasonality: grid bounds and per-type event conservation") {
    val r = Sequences.qSeasonality(spark, sf).collect()
    assert(r.forall { x =>
      val dw = x.getAs[Long]("dow"); val h = x.getAs[Long]("hr")
      dw >= 0 && dw <= 6 && h >= 0 && h <= 23 })
    val byType = r.groupBy(_.getString(0))
    val truth = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    byType.foreach { case (t, cells) =>
      assert(cells.map(_.getAs[Long]("n_events")).sum === truth(t))
      val shareSum = cells.map(_.getAs[Long]("share_permille")).sum
      // floors: within cells-count slack below exact 1000
      assert(shareSum <= 1000 && shareSum >= 1000 - cells.length)
    }
  }

  test("join_size_proof: histogram sum-of-squares replayed from collected counts") {
    val r = operators.Relational.qJoinSizeProof(spark, sf).collect()(0)
    val counts = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getLong(1))
    assert(r.getAs[Long]("n_rows") === counts.sum)
    assert(r.getAs[Long]("n_keys") === counts.length.toLong)
    assert(r.getAs[Long]("n_join") === counts.map(c => c * c).sum)
    assert(r.getAs[Long]("max_key") === counts.max)
    // a self-join always contains at least the identity pairs
    assert(r.getAs[Long]("n_join") >= r.getAs[Long]("n_rows"))
  }

  test("referential_orphans: five FK edges, all clean on the synthetic lake") {
    val r = operators.Relational.qReferentialOrphans(spark, sf).collect()
    assert(r.length === 5)
    assert(r.forall(_.getAs[Long]("n_orphans") === 0L))
    val byFk = r.map(x => x.getString(0) -> x.getAs[Long]("n_child")).toMap
    assert(byFk("lineitem.l_orderkey->orders") === Tables.lineitem(spark, sf).count())
    assert(byFk("orders.o_custkey->customer") === Tables.orders(spark, sf).count())
  }

  test("moment_merge: merged partials equal direct BigInt moments") {
    val r = Profiling.qMomentMerge(spark, sf).collect()
    assert(r.forall(_.getAs[Long]("n_partials") === 2L))
    val docs = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(col("source"),
        size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long"))
      .collect().map(x => (x.getString(0), BigInt(x.getLong(1))))
    val direct = docs.groupBy(_._1).map { case (s, xs) =>
      val n = BigInt(xs.length); val sx = xs.map(_._2).sum
      val qx = xs.map(x => x._2 * x._2).sum
      s -> (((sx * 1000) / n).toLong, (((n * qx - sx * sx) * 1000) / (n * n)).toLong)
    }
    r.foreach { x =>
      val (m, v) = direct(x.getString(0))
      assert(x.getAs[Long]("mean_milli") === m)
      assert(x.getAs[Long]("var_milli") === v)
    }
  }

  test("functional_deps: nation FD holds, flags are consistent") {
    val r = operators.Profiling.qFunctionalDeps(spark, sf).collect()
    assert(r.length === 4)
    r.foreach { x =>
      assert(x.getAs[Long]("n_violating") <= x.getAs[Long]("n_keys"))
      assert(x.getAs[Long]("holds") ===
        (if (x.getAs[Long]("n_violating") == 0L) 1L else 0L))
    }
    val nation = r.find(_.getString(0) == "nation.n_name->n_regionkey").get
    assert(nation.getAs[Long]("holds") === 1L)
    assert(nation.getAs[Long]("n_keys") === Tables.nation(spark, sf).count())
  }

  test("benford_digits: the nine Benford constants, shares conserve to 1000") {
    val r = operators.Profiling.qBenfordDigits(spark, sf).collect()
    assert(r.map(_.getAs[Long]("digit")).toSeq === (1L to 9L))
    assert(r.map(_.getAs[Long]("benford_permille")).toSeq ===
      Seq(301L, 176L, 124L, 96L, 79L, 66L, 57L, 51L, 45L))
    val shares = r.map(_.getAs[Long]("obs_permille")).sum
    assert(shares <= 1000 && shares >= 1000 - 9)
    r.foreach(x => assert(x.getAs[Long]("delta_permille") ===
      x.getAs[Long]("obs_permille") - x.getAs[Long]("benford_permille")))
  }

  test("tail_latency: percentiles ordered, gap count conserves events minus users") {
    val r = Sequences.qTailLatency(spark, sf).collect()
    r.foreach { x =>
      assert(x.getAs[Long]("p50_us") <= x.getAs[Long]("p95_us"))
      assert(x.getAs[Long]("p95_us") <= x.getAs[Long]("p99_us"))
      assert(x.getAs[Long]("n_gaps") >= 1L)
    }
    val ev = Tables.events(spark, sf)
    val want = ev.count() - ev.select("user_id").distinct().count()
    assert(r.map(_.getAs[Long]("n_gaps")).sum === want)
  }

  test("binary_magic: byte-level binary path agrees with residue-class truth") {
    val r = operators.Multimodal.qBinaryMagic(spark, sf).collect()
    assert(r.length === 4)
    val nDocs = Tables.documents(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_files")).sum === nDocs)
    r.foreach { x =>
      // every payload is 4 magic + 32 md5 bytes
      assert(x.getAs[Long]("total_bytes") === 36L * x.getAs[Long]("n_files"))
      assert(x.getAs[Long]("sum_first_byte") >= 0)
    }
    val fm = r.map(x => x.getString(0) -> x.getString(1)).toMap
    assert(fm("89504E47") === "png" && fm("FFD8FFE0") === "jpeg")
    assert(fm("52494646") === "riff" && fm("00000018") === "bmff")
  }

  test("lsh_cost_sweep: nested bands make slots and hot buckets monotone in r") {
    val r = operators.Dedup.qLshCostSweep(spark, sf).collect()
      .sortBy(_.getAs[Long]("rows_per_band"))
    assert(r.map(_.getAs[Long]("rows_per_band")).toSeq === Seq(1L, 2L, 4L, 8L))
    assert(r.map(_.getAs[Long]("n_bands")).toSeq === Seq(8L, 4L, 2L, 1L))
    // a level-r band collision implies collisions in BOTH its nested
    // level-r/2 sub-bands, so slot counts decrease as r grows
    val slots = r.map(_.getAs[Long]("n_candidate_slots"))
    assert(slots.toSeq === slots.sorted.reverse.toSeq)
    val hot = r.map(_.getAs[Long]("max_bucket"))
    assert(hot.toSeq === hot.sorted.reverse.toSeq)
    // the production config (r=4, 2 bands) must see at least the
    // distinct candidate pairs the LSH join emits
    val pairs = operators.Dedup.minhashCandidatePairs(spark, sf).count()
    assert(r(2).getAs[Long]("n_candidate_slots") >= pairs)
  }

  test("packing_efficiency: padding waste grows with context, packing beats it") {
    val r = operators.Packing.qPackingEfficiency(spark, sf).collect()
      .sortBy(_.getAs[Long]("ctx_len"))
    assert(r.map(_.getAs[Long]("ctx_len")).toSeq === Seq(256L, 512L, 1024L))
    r.foreach { x =>
      assert(x.getAs[Long]("packed_waste_permille") <=
        x.getAs[Long]("pad_waste_permille"))
    }
    val pad = r.map(_.getAs[Long]("pad_waste_permille"))
    assert(pad.toSeq === pad.sorted.toSeq) // coarser grid, more padding
    // exact replay at L=256
    val toks = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(operators.Packing.wsTokens(col("text"))).collect().map(_.getLong(0))
    val total = toks.sum
    val padded = toks.map(t => ((t + 255) / 256) * 256).sum
    assert(r(0).getAs[Long]("total_tokens") === total)
    assert(r(0).getAs[Long]("pad_waste_permille") ===
      (padded - total) * 1000 / padded)
  }

  test("cdc_apply: final state replays the ordered change stream") {
    val r = operators.Sequences.qCdcApply(spark, sf).collect()
      .map(x => x.getAs[Long]("user_id") -> x).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"),
        graft.functions.Exprs.intScaled(
          graft.functions.Exprs.dec2(col("value")), 100L).as("v"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3),
        x.getLong(4)))
    val byUser = ev.groupBy(_._1)
    assert(r.size === byUser.size)
    byUser.foreach { case (u, ops) =>
      val sorted = ops.sortBy(o => (o._4, o._2))
      val got = r(u)
      assert(got.getAs[Long]("n_ops") === ops.length.toLong)
      assert(got.getAs[String]("last_op") === sorted.last._3)
      assert(got.getAs[Long]("alive") ===
        (if (sorted.last._3 == "error") 0L else 1L))
      val lastUp = sorted.reverse.find(_._3 != "error")
      assert(got.getAs[Long]("current_cents") === lastUp.map(_._5).getOrElse(0L))
    }
  }

  test("degree_histogram: nodes and degree mass conserve against the pair list") {
    val r = Graphs.qDegreeHistogram(spark, sf).collect()
    val pairs = operators.Dedup.minhashCandidatePairs(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.length
    assert(r.map(_.getAs[Long]("n_nodes")).sum === nodes.toLong)
    assert(r.map(_.getAs[Long]("degree_mass")).sum === 2L * pairs.length)
    val mp = r.map(_.getAs[Long]("mass_permille")).sum
    assert(mp <= 1000 && mp >= 1000 - r.length)
  }

  test("label_propagation: full scala replay of one synchronous LP step") {
    val pairs = operators.Dedup.minhashCandidatePairs(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val langs = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val nbrs = (pairs.map(p => p._1 -> p._2) ++ pairs.map(p => p._2 -> p._1))
      .groupBy(_._1).map { case (v, es) => v -> es.map(e => langs(e._2)) }
    val want = nbrs.map { case (v, ls) =>
      val counts = ls.groupBy(identity).map { case (l, xs) => l -> xs.length }
      val cmax = counts.values.max
      val win = counts.filter(_._2 == cmax).keys.min
      v -> ((langs(v), win, cmax.toLong,
        if (langs(v) == win) 0L else 1L))
    }
    val got = Graphs.qLabelPropagation(spark, sf).collect().map(x =>
      x.getAs[Long]("doc_id") -> ((x.getString(1), x.getString(2),
        x.getAs[Long]("votes"), x.getAs[Long]("flipped")))).toMap
    assert(got === want)
  }

  test("centroid_drift: BigInt replay of the scaled mean-difference identity") {
    val rows = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull && size(col("embedding")) === 64)
      .select(col("label"), posexplode(transform(col("embedding"),
        x => (x.cast("double").cast("decimal(12,8)") * 100000000L).cast("long")))
        .as(Seq("i0", "u")))
      .collect().map(x => (x.getInt(0), x.getInt(1), BigInt(x.getLong(2))))
    val byLabelDim = rows.groupBy(r => (r._1, r._2))
      .map { case (k, xs) => k -> (xs.map(_._3).sum, BigInt(xs.length)) }
    val byDim = rows.groupBy(_._2)
      .map { case (k, xs) => k -> (xs.map(_._3).sum, BigInt(xs.length)) }
    val want = byLabelDim.groupBy(_._1._1).map { case (l, dims) =>
      val cl = dims.head._2._2
      val ss = dims.map { case ((_, dim), (sl, c)) =>
        val (sg, n) = byDim(dim)
        val delta = n * sl - c * sg; delta * delta
      }.sum
      val n = byDim.head._2._2
      l.toLong -> (ss / ((cl * n) * (cl * n))).toLong
    }
    val res = Similarity.qCentroidDrift(spark, sf).collect()
      .map(x => x.getAs[Int]("label").toLong -> x.getAs[Long]("dist2_e16")).toMap
    assert(res === want)
  }

  test("ivf_nprobe_sweep: candidates and recall monotone; nprobe=3 matches q_ivf_recall") {
    val r = Similarity.qIvfNprobeSweep(spark, sf).collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(r.map(_.getAs[Long]("nprobe")).toSeq === Seq(1L, 2L, 3L))
    val cands = r.map(_.getAs[Long]("n_candidates"))
    assert(cands.toSeq === cands.sorted.toSeq) // more probes, more candidates
    val matched = r.map(_.getAs[Long]("n_matched"))
    assert(matched.toSeq === matched.sorted.toSeq) // recall can only grow
    assert(r.forall(_.getAs[Long]("n_exact") === 9L))
    // the nprobe=3 point IS the production config q_ivf_recall measures
    val recall3 = Similarity.qIvfRecall(spark, sf).collect()
      .map(x => x.getAs[Long]("n_match")).sum
    assert(r(2).getAs[Long]("n_matched") === recall3)
  }

  test("kmv_intersect: exact column equals vocab_overlap; estimates sane") {
    val r = Profiling.qKmvIntersect(spark, sf).collect()
    val vo = operators.Pretrain.qVocabOverlap(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Long]("n_common"))
      .toMap
    assert(r.nonEmpty)
    r.foreach { x =>
      val key = (x.getString(0), x.getString(1))
      assert(x.getAs[Long]("n_common") === vo(key))
      assert(x.getAs[Long]("inter_est") >= 0L)
      // scala Long '/' truncates toward zero exactly like Spark's div
      assert(x.getAs[Long]("err_permille") ===
        (x.getAs[Long]("inter_est") - x.getAs[Long]("n_common")) * 1000 /
          x.getAs[Long]("n_common"))
    }
  }

  test("skipgram_pmi: full top-20 replayed from a sequential window scan") {
    val texts = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("text").collect().map(_.getString(0))
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    val uniCounts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      // split preserves empty tokens as positions (distance semantics);
      // only the pair/unigram ENDS are length-filtered, like the engine
      val ws = t.split(" ", -1)
      ws.foreach(w => if (w.nonEmpty)
        uniCounts.update(w, uniCounts.getOrElse(w, 0L) + 1))
      for (i <- ws.indices; o <- 1 to 3; if i + o < ws.length;
           if ws(i).nonEmpty && ws(i + o).nonEmpty) {
        val k = if (ws(i) <= ws(i + o)) (ws(i), ws(i + o))
                else (ws(i + o), ws(i))
        pairCounts.update(k, pairCounts.getOrElse(k, 0L) + 1)
      }
    }
    val kept = pairCounts.filter(_._2 >= 5L)
    val nPairs = kept.values.sum
    val expected = kept.toSeq.map { case ((a, b), n) =>
      (a, b, n, n * nPairs * 1000 / (uniCounts(a) * uniCounts(b)))
    }.sortBy { case (a, b, _, p) => (-p, a, b) }.take(20)
    val got = TextStats.qSkipgramPmi(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1), x.getAs[Long]("n_xy"),
        x.getAs[Long]("pmi_scaled"))).toSeq
    assert(got === expected)
  }

  test("kneser_ney: top-20 replayed; continuation stats match brute recount") {
    val texts = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("text").collect().map(_.getString(0))
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      for (i <- 0 until ws.length - 1; if ws(i).nonEmpty && ws(i + 1).nonEmpty)
        big.update((ws(i), ws(i + 1)), big.getOrElse((ws(i), ws(i + 1)), 0L) + 1)
    }
    val cX = big.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val nFollow = big.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val nPrecede = big.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val nTypes = big.size.toLong
    val expected = big.toSeq.map { case ((w1, w2), c) =>
      val pkn = (4 * c - 3) * 250000 / cX(w1) +
        750000 * nFollow(w1) * nPrecede(w2) / (cX(w1) * nTypes)
      (w1, w2, c, cX(w1), nFollow(w1), nPrecede(w2), pkn)
    }.sortBy { case (w1, w2, c, _, _, _, _) => (-c, w1, w2) }.take(20)
    val got = TextStats.qKneserNey(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1), x.getAs[Long]("c_xy"),
        x.getAs[Long]("c_x"), x.getAs[Long]("n_follow"),
        x.getAs[Long]("n_precede"), x.getAs[Long]("pkn_micro"))).toSeq
    assert(got === expected)
    // the discounted mass exists: every seen bigram keeps pkn > 0 and
    // the backoff share never exceeds the whole
    got.foreach { case (_, _, _, _, _, _, pkn) =>
      assert(pkn > 0L && pkn <= 1000000L) }
  }

  private def md5Long60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("bootstrap_ci: resample means replayed; order statistics line up") {
    // 15-bit Poisson(1) CDF grid; draw b = 8j+i reads md5 #j's 60-bit
    // half i/4 (hex chars [0,15) / [16,31)), 15-bit field i%4
    val cdf = Seq(12054L, 24109L, 30136L, 32145L, 32648L)
    val slotDiv = Seq(1L, 32768L, 1073741824L, 35184372088832L)
    def draw(id: Long, b: Int): Long = {
      val j = b / 8; val i = b % 8
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|boot|$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val half = java.lang.Long.parseLong(
        hex.substring((i / 4) * 16, (i / 4) * 16 + 15), 16)
      (half / slotDiv(i % 4)) % 32768L
    }
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = ev.groupBy(_._2).map { case (t, rows) =>
      val means = (0 until 64).flatMap { b =>
        var wsum = 0L; var wn = 0L
        rows.foreach { case (id, _, v) =>
          val u = draw(id, b)
          val w = cdf.count(u >= _)
          wsum += w * v; wn += w
        }
        if (wn > 0) Some((wsum / wn, b)) else None
      }.sorted
      t -> ((rows.length.toLong, rows.map(_._3).sum / rows.length,
        means.length.toLong, means(1)._1, means(62)._1))
    }
    val got = Sequences.qBootstrapCi(spark, sf).collect().map(r =>
      r.getString(0) -> ((r.getAs[Long]("n_rows"), r.getAs[Long]("mean_cents"),
        r.getAs[Long]("n_resamples"), r.getAs[Long]("ci_lo_cents"),
        r.getAs[Long]("ci_hi_cents")))).toMap
    assert(got === expected)
    got.values.foreach { case (_, _, nB, lo, hi) =>
      assert(nB === 64L); assert(lo <= hi) }
  }

  test("suffix_ranks: prefix-doubling equals a direct suffix sort") {
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // token order must be UTF-8 BINARY (both engines' collation), not
    // Java's UTF-16 compareTo
    def bytesLt(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    def seqLt(a: Seq[String], b: Seq[String]): Boolean = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        if (a(i) != b(i)) return bytesLt(a(i), b(i))
        i += 1
      }
      a.length < b.length
    }
    val suffixes = docs.flatMap { case (id, text) =>
      val arr = text.split(" ", -1).toSeq
      arr.indices.map(p => ((id, p + 1L), arr.drop(p)))
    }
    val sorted = suffixes.sortWith((x, y) => seqLt(x._2, y._2))
    val expected = scala.collection.mutable.Map.empty[(Long, Long), Long]
    var rank = 0L
    var prev: Option[Seq[String]] = None
    sorted.foreach { case (key, suf) =>
      if (!prev.contains(suf)) { rank += 1; prev = Some(suf) }
      expected(key) = rank
    }
    val got = CorpusOps.qSuffixRanks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected.toMap)
  }

  test("repeated_spans: a planted 40-token repeat tops the list, capped at 32") {
    import org.apache.spark.sql.functions.{col => c, length => len, lit}
    import spark.implicits._
    val span = (1 to 40).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"aa bb cc $span", "en"),
      (2L, s"xx yy $span zz", "en"),
      (3L, "qq rr ss tt", "en"))
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    docs.toDF("doc_id", "text", "lang")
      .select(c("doc_id"), c("text"), c("lang"), lit("s").as("source"),
        len(c("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusOps.qRepeatedSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Long]("lcp_tokens")))
    // capped LCP: the 40-token repeat reports 32, not 40
    assert(rows.head._5 == 32L, rows.head.toString)
    // list is sorted non-increasing, all within cap
    assert(rows.map(_._5).toSeq == rows.map(_._5).sortBy(-_).toSeq)
    assert(rows.forall(_._5 <= 32L))
    // every max-lcp pair connects the two planted docs at the
    // offset-consistent positions (span starts at token 4 in doc 1,
    // token 3 in doc 2; suffix k inside the span pairs 4+k with 3+k)
    rows.filter(_._5 == 32L).foreach { case (ad, ap, bd, bp, _) =>
      assert(Set(ad, bd) == Set(1L, 2L))
      val (p1, p2) = if (ad == 1L) (ap, bp) else (bp, ap)
      assert(p1 - p2 == 1L, s"($ad,$ap)-($bd,$bp)")
    }
  }

  test("psi_drift: midpoint-split PSI replays; every term non-negative") {
    val rows = Tables.eventsWithEpoch(spark, sf)
      .select(col("ts_us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (rows.map(_._1).min + rows.map(_._1).max) / 2
    def bucket(v: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val ref = rows.filter(_._1 <= mid).map(e => bucket(e._2))
    val cur = rows.filter(_._1 > mid).map(e => bucket(e._2))
    val buckets = (ref ++ cur).distinct.sorted
    val nB = buckets.length
    val expected = buckets.map { b =>
      val cR = ref.count(_ == b).toLong
      val cC = cur.count(_ == b).toLong
      val p = (cR + 1).toDouble / (ref.length + nB)
      val q = (cC + 1).toDouble / (cur.length + nB)
      b -> ((cR, cC, math.floor(1000000.0 * (p - q) * math.log(p / q)).toLong))
    }.toMap
    val got = Profiling.qPsiDrift(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("term_micro")))).toMap
    assert(got === expected)
    got.values.foreach { case (_, _, t) => assert(t >= 0L) }
  }

  test("rolling_median: sliding 7-row lower median replays the sequential scan") {
    val rows = Tables.eventsWithEpoch(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).iterator.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      ordered.zipWithIndex.map { case ((u, id, ts, v), i) =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1).map(_._4).sorted
        (u, id, ts, v) -> frame((frame.length + 1) / 2 - 1)
      }
    }.toMap
    val got = Sequences.qRollingMedian(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ->
        r.getAs[Long]("med7_cents")).toMap
    assert(got === expected)
  }

  test("content_chunks: sequential LBFS chunker replay; bytes conserve") {
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (src, t) =>
      val len = t.length
      val ends = ((4 to len).filter(e =>
        md5Long60(t.substring(e - 4, e)) % 64 == 0) :+ len).distinct.sorted
      var st = 1
      ends.foreach { e =>
        val c = t.substring(st - 1, e)
        counts.update((src, c), counts.getOrElse((src, c), 0L) + 1)
        st = e + 1
      }
    }
    val expected = counts.toSeq.groupBy(_._1._1).map { case (src, cs) =>
      val n = cs.map(_._2).sum
      val tb = cs.map { case ((_, c), k) => k * c.length }.sum
      val sb = cs.map { case ((_, c), k) => (k - 1) * c.length }.sum
      src -> ((n, cs.length.toLong, tb, sb, sb * 1000 / tb, tb / n))
    }
    val got = CorpusOps.qContentChunks(spark, sf).collect().map(r =>
      r.getString(0) -> ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_distinct"),
        r.getAs[Long]("total_bytes"), r.getAs[Long]("saved_bytes"),
        r.getAs[Long]("dedup_permille"), r.getAs[Long]("avg_chunk_len")))).toMap
    assert(got === expected)
    // chunking is a partition of each document: bytes in == bytes out
    val bySrc = docs.groupBy(_._1).map { case (s2, ds) =>
      s2 -> ds.map(_._2.length.toLong).sum }
    got.foreach { case (s2, (_, _, tb, _, _, _)) => assert(tb === bySrc(s2)) }
  }

  test("hnsw_levels: inverse-CDF geometric assignment replayed") {
    val ids = Tables.embeddings(spark, sf).select("vec_id")
      .collect().map(_.getLong(0))
    val thr = Seq(144115188075855872L, 18014398509481984L, 2251799813685248L,
      281474976710656L, 35184372088832L, 4398046511104L)
    val lvls = ids.map(id => id -> thr.count(md5Long60(s"hnsw|$id") < _).toLong)
    val byLvl = lvls.groupBy(_._2)
    val r = operators.Similarity.qHnswLevels(spark, sf).collect()
    assert(r.map(_.getAs[Long]("level")).toSeq ===
      byLvl.keys.toSeq.sorted)
    r.foreach { row =>
      val l = row.getAs[Long]("level")
      assert(row.getAs[Long]("n_nodes") === byLvl(l).size.toLong)
      assert(row.getAs[Long]("min_vec_id") === byLvl(l).map(_._1).min)
      assert(row.getAs[Long]("cum_nodes") ===
        lvls.count(_._2 >= l).toLong)
      assert(row.getAs[Long]("frac_permille") ===
        byLvl(l).size.toLong * 1000 / ids.length)
    }
    // level-0 mass dominates: the geometric layer law
    assert(byLvl(0L).size > ids.length / 2)
  }

  test("k_anonymity: small equivalence classes replayed from a brute census") {
    val rows = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
          + " + 100000) div 100000"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 < 5L).toMap
    val got = operators.Relational.qKAnonymity(spark, sf).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)) -> r.getAs[Long]("k")).toMap
    assert(got === expected)
    got.values.foreach(k => assert(k >= 1L && k < 5L))
  }

  test("l_diversity: distinct-sensitive census replayed; homogeneous groups flagged") {
    val rows = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
          + " + 100000) div 100000"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = rows.groupBy(t => (t._1, t._2)).view.mapValues { g =>
      val l = g.map(_._3).distinct.size.toLong
      (g.size.toLong, l, if (l >= 3) 1L else 0L)
    }.toMap
    val got = operators.Relational.qLDiversity(spark, sf).collect().map(r =>
      (r.getLong(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("l_distinct"),
          r.getAs[Long]("diverse")))).toMap
    assert(got === expected)
    // l never exceeds group size (a homogeneous group has l = 1 < n)
    got.values.foreach { case (n, l, _) => assert(l >= 1L && l <= n) }
  }

  test("t_closeness: EMD permille replayed exactly from a brute BigInt census") {
    val rows = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
          + " + 100000) div 100000"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val domain = rows.map(_._3).distinct.sorted
    val nTotal = BigInt(rows.length)
    val m = BigInt(domain.length)
    val globCum = domain.scanLeft(BigInt(0))((acc, v) =>
      acc + rows.count(_._3 == v)).tail
    val expected = rows.groupBy(t => (t._1, t._2)).view.mapValues { g =>
      val n = BigInt(g.size)
      val gCum = domain.scanLeft(BigInt(0))((acc, v) =>
        acc + g.count(_._3 == v)).tail
      val num = gCum.zip(globCum).map { case (cg, cp) =>
        (cg * nTotal - cp * n).abs }.sum
      val permille = (num * 1000) / (((m - 1) max 1) * n * nTotal)
      (n.toLong, permille.toLong, if (permille <= 200) 1L else 0L)
    }.toMap
    val got = operators.Relational.qTCloseness(spark, sf).collect().map(r =>
      (r.getLong(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("emd_permille"),
          r.getAs[Long]("close")))).toMap
    assert(got === expected)
    // EMD is a normalized distance: permille in [0, 1000]
    got.values.foreach { case (_, p, _) => assert(p >= 0L && p <= 1000L) }
    // both verdicts occur at this sf (small groups drift from global)
    assert(got.values.exists(_._3 == 1L))
  }

  test("prune_proof: clustered layout never prunes less; row mass conserves") {
    val r = Profiling.qPruneProof(spark, sf).collect()
      .map(x => (x.getAs[Long]("yr"), x.getAs[Long]("qtr"), x.getString(2)) -> x)
      .toMap
    val qtrs = r.keys.map(k => (k._1, k._2)).toSet
    assert(qtrs.nonEmpty)
    qtrs.foreach { case (y, q) =>
      val ins = r((y, q, "insertion")); val clu = r((y, q, "clustered"))
      assert(clu.getAs[Long]("n_survive") <= ins.getAs[Long]("n_survive"))
      assert(ins.getAs[Long]("n_survive") <= ins.getAs[Long]("n_blocks"))
      assert(clu.getAs[Long]("n_survive") >= 1L)
      assert(ins.getAs[Long]("n_rows_match") === clu.getAs[Long]("n_rows_match"))
    }
    val totalRows = r.collect {
      case ((_, _, "insertion"), x) => x.getAs[Long]("n_rows_match") }.sum
    assert(totalRows === Tables.orders(spark, sf).count())
  }

  test("wordpiece: vocab + greedy walk replayed; pieces reconstruct the word") {
    val texts = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("text").collect().map(_.getString(0))
    val wordCounts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ", -1).filter(_.nonEmpty)
      .foreach(w => wordCounts.update(w, wordCounts.getOrElse(w, 0L) + 1)))
    def gramCounts(len: Int) = {
      val m = scala.collection.mutable.Map.empty[String, Long]
      wordCounts.foreach { case (w, n) =>
        if (w.length >= len)
          (0 to w.length - len).foreach { i =>
            val g = w.substring(i, i + len)
            m.update(g, m.getOrElse(g, 0L) + n)
          }
      }
      m
    }
    val vocab = gramCounts(1).keySet ++
      gramCounts(2).toSeq.sortBy { case (g, c) => (-c, g) }.take(40).map(_._1) ++
      gramCounts(3).toSeq.sortBy { case (g, c) => (-c, g) }.take(20).map(_._1)
    def segment(w: String): Seq[String] = {
      var p = 0; val out = Seq.newBuilder[String]
      while (p < w.length) {
        val l = (3 to 1 by -1).find(l =>
          p + l <= w.length && vocab.contains(w.substring(p, p + l))).get
        out += w.substring(p, p + l); p += l
      }
      out.result()
    }
    val expected = wordCounts.toSeq.sortBy { case (w, n) => (-n, w) }.take(30)
      .map { case (w, n) =>
        val ps = segment(w)
        (w, n, ps.length.toLong, ps.mkString("|"))
      }
    val got = CorpusOps.qWordpiece(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("n_pieces"),
        r.getString(3))).toSeq
    assert(got === expected)
    // segmentation is a partition of the word, never an UNK
    got.foreach { case (w, _, _, ps) => assert(ps.replace("|", "") === w) }
  }

  test("burstiness: cf/df ratios replayed; function-word adaptation sane") {
    val texts = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("text").collect().map(_.getString(0))
    val cf = scala.collection.mutable.Map.empty[String, Long]
    val df = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val ws = t.split(" ", -1).filter(_.nonEmpty)
      ws.foreach(w => cf.update(w, cf.getOrElse(w, 0L) + 1))
      ws.distinct.foreach(w => df.update(w, df.getOrElse(w, 0L) + 1))
    }
    val expected = cf.toSeq.sortBy { case (w, c) => (-c, w) }.take(20)
      .map { case (w, c) =>
        (w, c, df(w), c * 1000000 / df(w), (c - df(w)) * 1000 / c) }
    val got = TextStats.qBurstiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("cf"), r.getAs[Long]("df"),
        r.getAs[Long]("burst_micro"), r.getAs[Long]("adapt_permille"))).toSeq
    assert(got === expected)
    // every kept word occurs at least as often as it has docs
    got.foreach { case (_, c, d2, b, _) =>
      assert(c >= d2); assert(b >= 1000000L) }
  }

  test("dup_positions: positional boilerplate profile replayed") {
    val docs = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val gramRows = docs.flatMap { case (id, src, t) =>
      val ws = t.split(" ", -1).filter(_.nonEmpty)
      if (ws.length < 3) Seq.empty
      else (0 to ws.length - 3).map(i =>
        (id, src, i.toLong, (ws.length - 2).toLong,
          ws.slice(i, i + 3).mkString(" ")))
    }
    val dfG = gramRows.map(r => (r._5, r._1)).distinct.groupBy(_._1)
      .map { case (g, xs) => g -> xs.size.toLong }
    val expected = gramRows
      .groupBy(r => (r._2, r._3 * 3 / r._4))
      .map { case ((src, third), rs) =>
        val nd = rs.count(r => dfG(r._5) >= 3).toLong
        (src, third) -> ((rs.length.toLong, nd, nd * 1000 / rs.length))
      }
    val got = CorpusOps.qDupPositions(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("third")) ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup"),
          r.getAs[Long]("dup_permille")))).toMap
    assert(got === expected)
  }

  test("sorted_neighbors: block-sort adjacency replayed; exact dups flagged") {
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull && length(col("text")) >= 8)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def lcp64(a: String, b: String): Long = {
      val m = math.min(math.min(a.length, b.length), 64)
      var i = 0
      while (i < m && a(i) == b(i)) i += 1
      i.toLong
    }
    val expected = docs.groupBy(_._2.substring(0, 8)).values.flatMap { blk =>
      val sorted = blk.sortBy(x => (x._2, x._1))
      sorted.zip(sorted.drop(1)).map { case ((ida, ta), (idb, tb)) =>
        (ida, idb, lcp64(ta, tb), if (ta == tb) 1L else 0L)
      }.filter(_._3 >= 16L)
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = Dedup.qSortedNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("lcp"),
        r.getAs[Long]("is_exact"))).toSeq
    assert(got === expected)
    // bounds: the probe is clamped and the filter floor holds; exact
    // flag implies a full-cap (or full-text) prefix match
    got.foreach { case (_, _, l, ex) =>
      assert(l >= 16L && l <= 64L)
      if (ex == 1L) assert(l === 64L || l >= 16L)
    }
    // (exact-dup flagging is pinned by the planted-fixture test in
    // RelevanceSpec — the sf0.001 corpus has near-dup prefixes only)
  }

  test("phrase_search: posting intersection equals the brute position scan") {
    val docs = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).filter(_.nonEmpty).toSeq))
      .filter(_._2.length >= 3)
    val tri = scala.collection.mutable.Map.empty[(String, String, String), Long]
    docs.foreach { case (_, ws) =>
      ws.sliding(3).foreach { g =>
        val k = (g(0), g(1), g(2))
        tri.update(k, tri.getOrElse(k, 0L) + 1)
      }
    }
    val phrase = tri.toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }.head._1
    val expected = docs.flatMap { case (id, ws) =>
      val n = ws.sliding(3).count(g => (g(0), g(1), g(2)) == phrase)
      if (n > 0) Some((id, phrase._1, phrase._2, phrase._3, n.toLong)) else None
    }.sortBy { case (id, _, _, _, n) => (-n, id) }.take(20)
    val got = operators.IndexStats.qPhraseSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getAs[Long]("n_hits"))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("weighted_median: one source replayed exactly against the running-sum rule") {
    val r = TextStats.qWeightedMedian(spark, sf).collect()
      .map(x => x.getString(0) -> x).toMap
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull && col("source") === "src0")
      .select(col("doc_id"), col("n_chars"),
        size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(x => (x._2, x._1))
    val tot = docs.map(_._3).sum
    var cum = 0L
    val wmed = docs.collectFirst {
      case (_, nc, t) if { cum += t; cum * 2 >= tot } => nc }.get
    val med = docs(if (docs.length % 2 == 0) docs.length / 2 - 1
                   else docs.length / 2)._2
    val got = r("src0")
    assert(got.getAs[Long]("wmedian_chars") === wmed)
    assert(got.getAs[Long]("median_chars") === med)
    assert(got.getAs[Long]("total_tokens") === tot)
  }
}
