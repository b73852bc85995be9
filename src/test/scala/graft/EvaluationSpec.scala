package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Profiling}

/** Semantics of the evaluation/statistics family against naive
  * recomputations (value-exactness vs DuckDB is the oracle gate's
  * job; these pin the MATH — rank-AUC vs pair counting, the kappa
  * identity, HLL register reconstruction, Gini bounds, the OLS
  * centroid identity) plus plan-shape guards on the scale-critical
  * joins. */
class EvaluationSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("roc_auc equals O(n^2) pair-counting AUC on every source") {
    val byRank = Evaluation.qRocAuc(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("source"), col("n_chars"), col("lang"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2) == "en"))
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val pos = rows.filter(_._3).map(_._2)
      val neg = rows.filterNot(_._3).map(_._2)
      if (pos.nonEmpty && neg.nonEmpty) {
        // 2·(wins + ties/2), exact integer — same doubling trick
        val u2 = pos.iterator.map { p =>
          2L * neg.count(_ < p) + neg.count(_ == p)
        }.sum
        val expected = (u2 * 1000000L) / (2L * pos.length * neg.length)
        val (np, nn, auc) = byRank(src)
        assert(np == pos.length && nn == neg.length)
        assert(auc == expected, s"$src: rank AUC $auc != pair AUC $expected")
      }
    }
  }

  test("pr_curve replays from a brute sort; curve endpoints pin base rate") {
    val got = Evaluation.qPrCurve(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("k"), r.getAs[Long]("tp"),
          r.getAs[Long]("precision_permille"),
          r.getAs[Long]("recall_permille")))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"), col("n_chars"), col("lang"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.getString(3) == "en") 1L else 0L))
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(t => (-t._3, t._2)) // score desc, doc_id
      val n = sorted.length
      val nPos = sorted.map(_._4).sum
      val byDecile = sorted.zipWithIndex
        .groupBy { case (_, i) => i.toLong * 10 / n + 1 }
      var k = 0L; var tp = 0L
      byDecile.keys.toSeq.sorted.foreach { dec =>
        k += byDecile(dec).length
        tp += byDecile(dec).map(_._1._4).sum
        val exp = (k, tp, tp * 1000 / k, tp * 1000 / math.max(nPos, 1L))
        assert(got((src, dec)) == exp, s"$src decile $dec")
      }
      // decile 10 is the whole source: precision = base rate, recall = all
      assert(got((src, 10L))._1 == n)
      if (nPos > 0) assert(got((src, 10L))._4 == 1000L)
    }
    // recall never decreases along each curve
    got.keys.map(_._1).foreach { src =>
      val curve = (1L to 10L).flatMap(d => got.get((src, d)).map(_._4))
      assert(curve == curve.sorted, s"$src recall not monotone")
    }
  }

  test("kappa matches a hand-rolled confusion-matrix computation") {
    val row = Evaluation.qKappaAgreement(spark, sf).collect().head
    val (n, agree) = (row.getLong(0), row.getLong(1))
    assert(row.getLong(2) == agree * 1000 / n) // po_permille
    // recompute pe from independently-derived marginals: kappa_micro
    // must satisfy the cross-multiplied identity exactly
    val m = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(
        graft.operators.TextStats.occurrences(col("text"), "the").as("t"),
        graft.operators.TextStats.occurrences(col("text"), "data").as("d"),
        graft.operators.TextStats.occurrences(col("text"), "scan").as("s"),
        graft.operators.TextStats.occurrences(col("text"), "join").as("j"))
      .collect().map { r =>
        val (t, d, s, j) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        val ca = if (t >= d && t >= s && t >= j) "en"
          else if (d >= s && d >= j) "dat" else if (s >= j) "scn" else "jon"
        val cb = if (j >= s && j >= d && j >= t) "jon"
          else if (s >= d && s >= t) "scn" else if (d >= t) "dat" else "en"
        (ca, cb)
      }
    assert(m.length == n)
    assert(m.count { case (a, b) => a == b } == agree)
    val ra = m.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cb = m.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pe = (ra.keySet ++ cb.keySet).iterator
      .map(c => ra.getOrElse(c, 0L) * cb.getOrElse(c, 0L)).sum
    val expected =
      (BigInt(n) * agree - pe) * 1000000 / (BigInt(n) * n - pe)
    assert(BigInt(row.getLong(3)) == expected)
  }

  test("chi2 terms are non-negative and the top list is en-dominated") {
    val rows = Evaluation.qChi2Terms(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0, s"chi2 must be >= 0: $r")
      assert(Set("en", "rest").contains(r.getString(4)))
      assert(r.getLong(2) <= r.getLong(1), "df_en <= df")
    }
    // descending by construction
    assert(rows.map(_.getLong(3)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("calibration bins partition the corpus and stay in permille range") {
    val rows = Evaluation.qCalibrationBins(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val corpus = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).count()
    assert(total == corpus)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000)
    }
  }

  test("basket lift agrees with a direct computation for the top pair") {
    val top = Evaluation.qBasketLift(spark, sf).collect().head
    val nab = top.getLong(2)
    val items = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("i"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemA = top.getString(0); val itemB = top.getString(1)
    val nAB = byOrder.valuesIterator.count(s => s(itemA) && s(itemB))
    assert(nAB.toLong == nab, s"pair ($itemA,$itemB): $nab vs direct $nAB")
    val nA = byOrder.valuesIterator.count(_(itemA)).toLong
    val nB = byOrder.valuesIterator.count(_(itemB)).toLong
    val nOrders = byOrder.size.toLong
    assert(top.getLong(5) == nab * nOrders * 1000000L / (nA * nB))
    // plan: frequency/total joins must broadcast, pair join must not
    // be a cartesian over the corpus
    val plan = Evaluation.qBasketLift(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("hll registers reconstruct: estimate within the m=64 error bound") {
    val rows = Profiling.qHllCardinality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est, err) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(err == (est - exact) * 1000 / exact)
      // raw HLL (no linear-counting correction) with m=64: rse ≈ 13%;
      // allow 4 sigma plus the documented low-cardinality bias
      assert(math.abs(err) < 600,
        s"${r.getString(0)}: |err| ${err} permille out of bound (exact $exact est $est)")
    }
  }

  test("key skew: gini bounded, orderkey near-uniform, shares consistent") {
    val rows = Profiling.qKeySkew(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rows.foreach { r =>
      val (nRows, nBuckets, maxB, minB, share, gini) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(nBuckets <= 32 && maxB >= minB)
      assert(share == maxB * 1000 / nRows)
      assert(gini >= 0 && gini < 1000000, s"gini $gini out of [0, 1e6)")
    }
    // all three keys profile the same table: same total row count
    assert(rows.map(_.getLong(1)).distinct.length == 1)
  }

  test("ols trend satisfies the centroid identity ŷ(x̄) = ȳ per group") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"),
        (expr("ts div 1000000000") - lit(1704067200L)).cast("double").as("x"),
        (col("value") * 100).cast("double").as("y"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val fits = Evaluation.qOlsTrend(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    ev.groupBy(_._1).foreach { case (t, rows) =>
      fits.get(t).foreach { case (slopeMicroDay, intercept) =>
        val xbar = rows.map(_._2).sum / rows.length
        val ybar = rows.map(_._3).sum / rows.length
        val slope = slopeMicroDay.toDouble / 1e6 / 86400.0
        val fitted = intercept + slope * xbar
        // integer flooring of slope+intercept: tolerance is |x̄| ulps
        // of the micro grid plus one cent of intercept rounding
        val tol = math.abs(xbar) / 1e6 / 86400.0 + 1.5
        assert(math.abs(fitted - ybar) <= tol,
          s"$t: fitted ŷ(x̄)=$fitted vs ȳ=$ybar (tol $tol)")
      }
    }
  }

  test("mann-whitney: midrank U replays the textbook hand example with ties") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), "mwu").toString
    import spark.implicits._
    // A = [1,2,2,5], B = [2,3]: joint midranks 1→1, 2→3, 3→5, 5→6
    // R1 = 1+3+3+6 = 13 → 2U1 = 26 − 4·5 = 6 (U1 = 3: pairs a>b are
    // (5,2),(5,3) plus two half-credit ties (2,2)) → CLES = 3/8 = 375‰
    val rows = Seq((1L, 1L, "a"), (2L, 2L, "a"), (3L, 2L, "a"), (4L, 5L, "a"),
      (5L, 2L, "b"), (6L, 3L, "b"))
    rows.map { case (i, n, src) => (i, s"doc $i", "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Evaluation.qMannWhitney(spark, dir).collect()
    assert(r.length === 1)
    val x = r.head
    assert(x.getAs[String]("source_a") === "a")
    assert(x.getAs[Long]("n1") === 4L && x.getAs[Long]("n2") === 2L)
    assert(x.getAs[Long]("u2x") === 6L)
    assert(x.getAs[Long]("cles_permille") === 375L)
  }

  test("simpson reversal: the textbook two-strata flip raises the flag") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), "simpson").toString
    import spark.implicits._
    // keep-doc passes qQualityScore's rule (10 tokens, 4 stopwords →
    // score 40%); fail-doc has 10 tokens, 0 stopwords → score 0
    val keep = "the a of and the a of and w1 w2"
    val fail = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    def docs(src: String, lang: String, nKeep: Int, nFail: Int, base: Long) =
      (0 until nKeep).map(i => (base + i, keep, lang, src)) ++
        (0 until nFail).map(i => (base + 1000 + i, fail, lang, src))
    // A wins BOTH strata (0.9>0.8 in l1, 0.111>0 in l2) but loses
    // pooled (19/100 vs 80/110) — the classic composition artifact
    val rows = docs("a", "l1", 9, 1, 0L) ++ docs("a", "l2", 10, 80, 10000L) ++
      docs("b", "l1", 80, 20, 20000L) ++ docs("b", "l2", 0, 10, 30000L)
    rows.map { case (i, t, l, s0) => (i, t, l, s0, t.length.toLong) }
      .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Evaluation.qSimpsonReversal(spark, dir).collect()
    assert(r.length === 1)
    val x = r.head
    assert(x.getAs[Long]("n_strata") === 2L)
    assert(x.getAs[Long]("pooled_verdict") === -1L) // b wins pooled
    assert(x.getAs[Long]("n_agree") === 0L)
    assert(x.getAs[Long]("n_reversed") === 2L)      // a won both strata
    assert(x.getAs[Boolean]("simpson_flag"))
  }

  test("mann-whitney on sf fixture: CLES symmetric-complement and in range") {
    val sf = "/root/testdata/sf0.001"
    val r = Evaluation.qMannWhitney(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val p = x.getAs[Long]("cles_permille")
      assert(p >= 0L && p <= 1000L)
      // 2U1 + 2U2 = 2·n1·n2: recompute U2 from the identity
      val u2x = x.getAs[Long]("u2x")
      val prod = 2L * x.getAs[Long]("n1") * x.getAs[Long]("n2")
      assert(u2x >= 0L && u2x <= prod)
    }
  }

  private def plantedDocs(name: String,
      rows: Seq[(Long, String, String, String, Long)]): String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), name).toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** nStop stopwords interleaved with filler so the non-overlapping
    * " word " counter sees every one; total token count exact. */
  private def mkText(nTok: Int, nStop: Int): String = {
    require(nStop * 2 <= nTok)
    val stops = Seq.fill(nStop)(Seq("the", "w")).flatten
    (stops ++ Seq.fill(nTok - stops.length)("w")).mkString(" ")
  }

  test("kendall tau: hand-counted concordant/discordant/tie pairs replay") {
    // (x=tokens, bucket): A(10,0) B(20,7) C(30,15) D(20,0) E(40,2) —
    // conc {AB,AC,AE,BC,CD,DE}=6, disc {BE,CE}=2, x-tie {BD}, y-tie {AD}
    val dir = plantedDocs("kendall", Seq(
      (1L, mkText(10, 0), "en", "s1", 10L),
      (2L, mkText(20, 5), "en", "s1", 20L),   // permille 250 -> b 7
      (3L, mkText(30, 15), "en", "s1", 30L),  // permille 500 -> b 15
      (4L, mkText(20, 0), "en", "s1", 20L),
      (5L, mkText(40, 3), "en", "s1", 40L)))  // permille 75 -> b 2
    val r = Evaluation.qKendallTau(spark, dir).collect()
    assert(r.length === 1)
    val x = r.head
    assert(x.getAs[Long]("n") === 5L)
    assert(x.getAs[Long]("n_conc") === 6L)
    assert(x.getAs[Long]("n_disc") === 2L)
    assert(x.getAs[Long]("n_ties_x") === 1L)
    assert(x.getAs[Long]("n_ties_y") === 1L)
    // pair classes partition n0 = 10; tau_a = (6-2)*1000 div 10
    assert(x.getAs[Long]("tau_a_permille") === 400L)
  }

  test("kendall tau: negative tau floors like DuckDB (additive-shift division)") {
    // perfectly anti-ordered, no ties: x up, bucket down -> tau_a = -1000
    val dir = plantedDocs("kendallneg", Seq(
      (1L, mkText(10, 5), "en", "s1", 10L),   // permille 500 -> b 15
      (2L, mkText(20, 5), "en", "s1", 20L),   // permille 250 -> b 7
      (3L, mkText(40, 3), "en", "s1", 40L)))  // permille 75  -> b 2
    val r = Evaluation.qKendallTau(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_conc") === 0L)
    assert(r.head.getAs[Long]("n_disc") === 3L)
    assert(r.head.getAs[Long]("tau_a_permille") === -1000L)
  }

  test("wasserstein 1d: hand CDF integral replays exactly") {
    // A lengths {1,1,3}, B lengths {2,4}: W1 = 4/3 -> 1333 milli
    val dir = plantedDocs("wass", Seq(
      (1L, "x", "en", "a", 1L), (2L, "x", "en", "a", 1L),
      (3L, "x", "en", "a", 3L),
      (4L, "x", "en", "b", 2L), (5L, "x", "en", "b", 4L)))
    val r = Evaluation.qWasserstein1d(spark, dir).collect()
    assert(r.length === 1)
    val x = r.head
    assert(x.getAs[String]("source_a") === "a")
    assert(x.getAs[Long]("n_a") === 3L && x.getAs[Long]("n_b") === 2L)
    assert(x.getAs[Long]("w1_milli") === 1333L)
  }

  test("wasserstein 1d: identical distributions measure zero; shift measures the shift") {
    val dir = plantedDocs("wass0", Seq(
      (1L, "x", "en", "a", 5L), (2L, "x", "en", "a", 9L),
      (3L, "x", "en", "b", 5L), (4L, "x", "en", "b", 9L),
      // c = a + 100: EMD of a point-mass shift is exactly the shift
      (5L, "x", "en", "c", 105L), (6L, "x", "en", "c", 109L)))
    val got = Evaluation.qWasserstein1d(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("w1_milli"))
      .toMap
    assert(got(("a", "b")) === 0L)
    assert(got(("a", "c")) === 100000L)
  }

  test("theil index: equal-mass sources zero within; shares and between terms replay") {
    // s1 = [2,2] tokens, s2 = [4]: within-Theil is exactly 0 for both
    // (all log2 ratios are 1); s3 = [1,3] has genuine within-inequality
    val dir = plantedDocs("theil", Seq(
      (1L, "w w", "en", "s1", 3L), (2L, "w w", "en", "s1", 3L),
      (3L, "w w w w", "en", "s2", 7L),
      (4L, "w", "en", "s3", 1L), (5L, "w w w", "en", "s3", 5L)))
    val got = Profiling.qTheilIndex(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("s1", "s2", "s3"))
    assert(got("s1").getAs[Long]("t_within_micro") === 0L)
    assert(got("s2").getAs[Long]("t_within_micro") === 0L)
    assert(got("s3").getAs[Long]("t_within_micro") > 0L)
    // shares on the exact integer grid: 4/12, 4/12, 4/12 of token mass
    Seq("s1", "s2", "s3").foreach(s =>
      assert(got(s).getAs[Long]("share_micro") === 333333L))
    // between terms: s1/s3 have n_s=2 (denser docs than average), s2
    // n_s=1; hand floors: 1e6*(4/12)*log2(4*5/(12*2)) and *log2(20/12)
    val b1 = got("s1").getAs[Long]("t_between_term_micro")
    val b2 = got("s2").getAs[Long]("t_between_term_micro")
    assert(b1 === got("s3").getAs[Long]("t_between_term_micro"))
    assert(math.abs(b1 - math.floor(1e6 * (4.0 / 12)
      * (math.log(4.0 * 5 / (12.0 * 2)) / math.log(2))).toLong) <= 1)
    assert(math.abs(b2 - math.floor(1e6 * (4.0 / 12)
      * (math.log(4.0 * 5 / 12.0) / math.log(2))).toLong) <= 1)
  }

  test("crossdomain ppl: hand-scored 2x2 transfer matrix replays") {
    // s1: "a b a b" -> bigrams (a,b)x2 (b,a)x1, uni a:2 b:2, N=4
    // s2: "a c"     -> bigram (a,c)x1, uni a:1 c:1, N=2
    val dir = plantedDocs("xppl", Seq(
      (1L, "a b a b", "en", "s1", 7L),
      (2L, "a c", "en", "s2", 3L)))
    val got = graft.operators.CorpusOps.qCrossdomainPpl(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_backoff"),
          r.getAs[Long]("bits_milli"), r.getAs[Long]("bpt_milli"))))
      .toMap
    assert(got.size === 4, "full ordered matrix incl. diagonal")
    // in-domain s1: (a,b) seen log2(2/2)=0; (b,a) seen log2(2/1)=1 bit
    assert(got(("s1", "s1")) === ((3L, 0L, 1000L, 333L)))
    // s1 -> s2: (a,c) unseen, c('c')=0 -> floor(1000*log2(2.5*4/1))
    assert(got(("s1", "s2")) === ((1L, 1L, 3321L, 3321L)))
    // s2 -> s1: all three unseen; backoff log2(2.5*2/1) per instance
    assert(got(("s2", "s1")) === ((3L, 3L, 3L * 2321L, 2321L)))
    // in-domain s2: exact hit, zero bits
    assert(got(("s2", "s2")) === ((1L, 0L, 0L, 0L)))
  }

  test("mcnemar filters: 2x2 cells, agreement, and discordant statistic replay") {
    // both-keep / 2x A-only (len ratio 2) / B-only (no stops) / neither
    val dir = plantedDocs("mcnemar", Seq(
      (1L, mkText(20, 5), "en", "s1", 100L),  // ka (25% stops), kb (len/nt=5)
      (2L, mkText(20, 5), "en", "s1", 40L),   // ka, !kb (2 < 3)
      (3L, mkText(20, 5), "en", "s1", 41L),   // ka, !kb (41 div 20 = 2)
      (4L, mkText(20, 0), "en", "s1", 100L),  // !ka (0% stops), kb
      (5L, mkText(20, 0), "en", "s1", 400L))) // !ka, !kb (20 > 12)
    val r = Evaluation.qMcnemarFilters(spark, dir).collect()
    assert(r.length === 1)
    val x = r.head
    assert(x.getAs[Long]("n") === 5L)
    assert((x.getAs[Long]("n_both"), x.getAs[Long]("n_a_only"),
      x.getAs[Long]("n_b_only"), x.getAs[Long]("n_neither"))
      === ((1L, 2L, 1L, 1L)))
    assert(x.getAs[Long]("agree_permille") === 400L)
    // (b-c)^2 * 1000 div (b+c) = 1*1000 div 3
    assert(x.getAs[Long]("mcnemar_permille") === 333L)
  }

  test("kruskal-wallis: exact-integer brute replay (sorted midranks)") {
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("n_chars").isNotNull)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val all = docs.map(_._2).sorted
    val nTot = BigInt(all.length)
    // doubled midrank per value: 2*|{u<v}| + c_v + 1
    val cnt = all.groupBy(identity).view.mapValues(_.length).toMap
    val below = all.distinct.map(v => v -> all.count(_ < v)).toMap
    def mr2(v: Long) = BigInt(2 * below(v) + cnt(v) + 1)
    val bySrc = docs.groupBy(_._1)
    val parts = bySrc.map { case (src, rows) =>
      val n = BigInt(rows.length)
      val rs2 = rows.map(r => mr2(r._2)).sum
      val dv = rs2 - n * (nTot + 1)
      (src, n, rs2, dv, (dv * dv * 1000000) / n)
    }
    val hMicro = (3 * parts.map(_._5).sum) / (nTot * (nTot + 1))
    val tieNum = cnt.values.map(c => BigInt(c).pow(3) - c).sum
    val n3n = nTot.pow(3) - nTot
    val tiePpm = ((n3n - tieNum) * 1000000) / n3n
    val hCorr = (hMicro * 1000000) / tiePpm
    val got = Evaluation.qKruskalWallis(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.size === bySrc.size)
    parts.foreach { case (src, n, rs2, dv, _) =>
      val g = got(src)
      assert(g.getAs[Long]("n") === n.toLong, src)
      assert(g.getAs[Long]("ranksum2") === rs2.toLong, src)
      assert(g.getAs[Long]("dev2x") === dv.toLong, src)
      assert(g.getAs[Long]("h_micro") === hMicro.toLong, src)
      assert(g.getAs[Long]("tie_ppm") === tiePpm.toLong, src)
      assert(g.getAs[Long]("h_tiecorr_micro") === hCorr.toLong, src)
    }
    // rank-sum identity: doubled rank sums total 2 * N(N+1)/2
    assert(parts.map(_._3).sum === nTot * (nTot + 1))
  }

  test("cramers v: full-grid chi2 replay; independence fixture scores 0") {
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("lang").isNotNull && col("source").isNotNull)
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = BigInt(docs.length)
    val rowT = docs.groupBy(_._1).view.mapValues(x => BigInt(x.length)).toMap
    val colT = docs.groupBy(_._2).view.mapValues(x => BigInt(x.length)).toMap
    val cells = docs.groupBy(identity).view.mapValues(x => BigInt(x.length)).toMap
    // keys.toSeq: a for-yield over Sets would DEDUPLICATE equal terms
    val chi2 = (for (l <- rowT.keys.toSeq; s <- colT.keys.toSeq) yield {
      val o = cells.getOrElse((l, s), BigInt(0))
      val d = o * n - rowT(l) * colT(s)
      (d * d * 1000000) / (n * rowT(l) * colT(s))
    }).sum
    val v2 = chi2 / (n * (math.min(rowT.size, colT.size) - 1))
    val g = Evaluation.qCramersV(spark, sf).collect().head
    assert(g.getAs[Long]("n") === n.toLong)
    assert(g.getAs[Long]("n_rows") === rowT.size.toLong)
    assert(g.getAs[Long]("n_cols") === colT.size.toLong)
    assert(g.getAs[Long]("chi2_micro") === chi2.toLong)
    assert(g.getAs[Long]("v2_micro") === v2.toLong)
    // perfectly independent 2x2 fixture: chi2 exactly 0
    val dir = plantedDocs("cramind", Seq(
      (1L, "t", "en", "s1", 10L), (2L, "t", "en", "s2", 10L),
      (3L, "t", "de", "s1", 10L), (4L, "t", "de", "s2", 10L)))
    val ind = Evaluation.qCramersV(spark, dir).collect().head
    assert(ind.getAs[Long]("chi2_micro") === 0L)
    assert(ind.getAs[Long]("v2_micro") === 0L)
  }

  test("cochran q + fleiss kappa: hand-counted planted panel") {
    // rules on (nt, nStop, len): A = stop%>=3 && nt>=10;
    // B = nt>=10 && len div nt in [3,12]; C = len in [120,2000]
    val dir = plantedDocs("cochran", Seq(
      (1L, mkText(20, 5), "en", "s1", 130L), // A,B(6),C   R=3
      (2L, mkText(20, 5), "en", "s1", 40L),  // A,!B(2),!C R=1
      (3L, mkText(20, 0), "en", "s1", 130L), // !A,B,C     R=2
      (4L, mkText(20, 0), "en", "s1", 60L),  // !A,B(3),!C R=1
      (5L, mkText(4, 1), "en", "s1", 100L))) // !A(nt<10),!B,!C R=0
    // C_a=2, C_b=3, C_c=2, T=7, sumR2=9+1+4+1+0=15
    val q = Evaluation.qCochranQ(spark, dir).collect().head
    assert((q.getAs[Long]("n"), q.getAs[Long]("keep_a"),
      q.getAs[Long]("keep_b"), q.getAs[Long]("keep_c")) === ((5L, 2L, 3L, 2L)))
    // Q = 2*(3*(4+9+4) - 49) / (21 - 15) = 2*2/6
    assert(q.getAs[Long]("q_milli") === (2L * (3 * 17 - 49) * 1000) / 6)
    val f = Evaluation.qFleissKappa(spark, dir).collect().head
    // pbar_num per doc (R=3,1,2,1,0): 6+2+2+2+6 = 18; pbar = 18/30
    assert(f.getAs[Long]("pbar_micro") === (18L * 1000000) / 30)
    // pe: T=7, 3n=15 -> (49 + 64)*1e6 / 225
    assert(f.getAs[Long]("pe_micro") === (113L * 1000000) / 225)
    val pbar = (18L * 1000000) / 30; val pe = (113L * 1000000) / 225
    val shift = ((pbar - pe) * 1000 + (1000000L - pe) * 2000) / (1000000L - pe) - 2000
    assert(f.getAs[Long]("kappa_milli") === shift)
    // unanimous fixture: pe = 1e6 -> NULL kappa
    val uni = plantedDocs("fleissuni", Seq(
      (1L, mkText(20, 5), "en", "s1", 130L),
      (2L, mkText(20, 5), "en", "s1", 131L)))
    val fu = Evaluation.qFleissKappa(spark, uni).collect().head
    assert(fu.getAs[Long]("pbar_micro") === 1000000L)
    assert(fu.isNullAt(fu.fieldIndex("kappa_milli")))
  }
}
