package graft

import java.nio.file.Files

import graft.operators.{Dedup, TextStats}

/** Behavioral pins for the quality-policy survivor dedup
  * ([[Dedup.qDedupBest]]) and the vocabulary-coverage audit
  * ([[TextStats.qVocabCoverage]]) on hand-built fixtures where the
  * expected winners are provable, not just oracle-matched:
  * simhash's per-occurrence voting means a doc dominated by one word
  * keeps its signature when that word's count grows (no sign can
  * cross zero), so same-signature groups with DIFFERENT quality
  * scores are constructible. */
class QualitySurvivorSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val docs = rows
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-quality-spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("qDedupBest keeps the highest-quality copy, min-id on ties") {
    // group A: doc 2 is doc 1 with more stopword mass — every simhash
    // bit's vote sum is 10*v(the)+v(dog) vs 20*v(the)+v(dog): same
    // signs, same signature, but score 45 vs 47 (the delimited-token
    // count matches every OTHER word in a stopword run — both engines
    // replace non-overlapping " the " occurrences) → doc 2 must win
    // group B: byte-identical docs 3/4 → equal score, tiebreak to id 3
    // doc 5 is a singleton and must not report
    val dir = writeDocs(Seq(
      1L -> ("the " * 10 + "dog"),
      2L -> ("the " * 20 + "dog"),
      3L -> ("of " * 8 + "fox"),
      4L -> ("of " * 8 + "fox"),
      5L -> "and and zebra"))
    val rows = Dedup.qDedupBest(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) // keep, count, best
    spark.catalog.clearCache()
    assert(rows.toSeq == Seq((2L, 2L, 47L), (3L, 2L, 44L)), rows.mkString(","))
  }

  test("qVocabCoverage: top-20 vocab with pinned boundary tie, OOV rate") {
    // 19 words at freq 5 fill ranks 1-19; "aa" and "ab" tie at freq 2
    // for the last slot → word-asc admits "aa", makes "ab" OOV; "rare1"
    // (freq 1) is OOV regardless
    val common = (1 to 19).map(i => f"w$i%02d").mkString(" ")
    val dir = writeDocs(Seq(
      10L -> Seq.fill(5)(common).mkString(" "), // 95 tokens, all in-vocab
      11L -> "aa aa ab ab rare1")) // 5 tokens, 3 OOV
    val rows = TextStats.qVocabCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    spark.catalog.clearCache()
    assert(rows.toSeq == Seq(
      (10L, 95L, 0L, 0L),
      (11L, 5L, 3L, 600L)), rows.mkString(","))
  }

  test("qFilterSweep is exactly the suffix-sum curve of qQualityScore") {
    val sf = "/root/testdata/sf0.001"
    // per-doc (bucket, tokens) from the score operator the sweep claims
    // to summarize — consistency between the two IS the contract
    val perDoc = TextStats.qQualityScore(spark, sf).collect()
      .filter(r => !r.isNullAt(r.fieldIndex("n_tokens")))
      .map(r => (math.min(r.getAs[Long]("score_pct") / 10, 10L),
        r.getAs[Long]("n_tokens")))
    val totalDocs = perDoc.length.toLong
    val totalToks = perDoc.map(_._2).sum
    val got = TextStats.qFilterSweep(spark, sf).collect()
      .map(r => r.getAs[Long]("threshold_pct") ->
        ((r.getAs[Long]("docs_kept"), r.getAs[Long]("tokens_kept"),
          r.getAs[Long]("docs_permille"), r.getAs[Long]("tokens_permille"))))
      .toMap
    got.keys.foreach { t =>
      val kept = perDoc.filter(_._1 >= t / 10)
      val (dk, tk) = (kept.length.toLong, kept.map(_._2).sum)
      assert(got(t) == ((dk, tk, dk * 1000 / totalDocs, tk * 1000 / totalToks)),
        s"threshold $t")
    }
    // threshold 0 keeps everything; curve is non-increasing in t
    assert(got(got.keys.min) == ((totalDocs, totalToks, 1000L, 1000L)))
    val curve = got.toSeq.sortBy(_._1).map(_._2._1)
    assert(curve == curve.sorted.reverse)
  }

  test("qCascadeFilter attrition replays from the per-doc rule flags") {
    val sf = "/root/testdata/sf0.001"
    val flags = TextStats.qQualityRules(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_words"),
        r.getAs[Boolean]("r_len"), r.getAs[Boolean]("r_wlen"),
        r.getAs[Boolean]("r_stop"), r.getAs[Boolean]("r_alpha")))
    type F = (Long, Boolean, Boolean, Boolean, Boolean)
    val stages = Seq[F => Boolean](
      _ => true, _._2, t => t._2 && t._3, t => t._2 && t._3 && t._4,
      t => t._2 && t._3 && t._4 && t._5)
    val got = TextStats.qCascadeFilter(spark, sf).collect()
      .map(r => r.getAs[Long]("stage") -> r).toMap
    assert(got.size === 5)
    val (totDocs, totToks) = (flags.length.toLong, flags.map(_._1).sum)
    var prevDocs = totDocs
    stages.zipWithIndex.foreach { case (p, k) =>
      val kept = flags.filter(p)
      val row = got(k.toLong)
      assert(row.getAs[Long]("docs_kept") === kept.length.toLong, s"stage $k")
      assert(row.getAs[Long]("tokens_kept") === kept.map(_._1).sum, s"stage $k")
      assert(row.getAs[Long]("dropped_here") === prevDocs - kept.length)
      assert(row.getAs[Long]("docs_permille") ===
        kept.length.toLong * 1000 / totDocs)
      assert(row.getAs[Long]("tokens_permille") ===
        kept.map(_._1).sum * 1000 / totToks)
      prevDocs = kept.length.toLong
    }
    // the cascade's end state equals qQualityRules' conjunction keep
    assert(got(4L).getAs[Long]("docs_kept") ===
      flags.count(t => t._2 && t._3 && t._4 && t._5).toLong)
  }

  test("qCondEntropy: deterministic alternation has zero conditional entropy") {
    // strictly alternating text: the next word is a FUNCTION of the
    // previous one, so H(W2|W1) is exactly 0 while H(W) stays positive
    // — the planted endpoint that separates the two rates
    val dir = writeDocs(Seq(
      (1L, "x y x y x y x"),
      (2L, "y x y x y"),
      (3L, "x y x y x y x y x")))
    val r = graft.operators.TextStats.qCondEntropy(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("h_cond_micro") === 0L)
    assert(row.getAs[Long]("h_uni_micro") > 900000L) // near-balanced binary
    assert(row.getAs[Long]("gain_micro") === row.getAs[Long]("h_uni_micro"))
    // sf fixture: conditioning never hurts beyond per-term flooring
    val sfr = graft.operators.TextStats
      .qCondEntropy(spark, "/root/testdata/sf0.001").collect()
    assert(sfr.nonEmpty)
    sfr.foreach { x =>
      assert(x.getAs[Long]("h_uni_micro") > 0L)
      assert(x.getAs[Long]("h_cond_micro") >= 0L)
      // exact H_cond ≤ exact H_uni; flooring slack is < #terms micros,
      // far under 1% of the entropy scale here
      assert(x.getAs[Long]("gain_micro") > -10000L)
    }
  }

  test("qDedupSweep is the suffix-sum curve of the verified pair list") {
    // same-length (same block) corpus: exact dup (J=1), partial overlap
    // (tail rewritten, J mid), and an unrelated doc — at least two
    // thresholds on the curve
    val base = "the quick brown fox jumps over the lazy dog while the cat " +
      "naps on the warm windowsill near the garden gate just after noon ok"
    val alt = base.dropRight(30) + ("x" * 30)
    assert(alt.length == base.length)
    val dir = writeDocs(Seq((1L, base), (2L, base), (3L, alt),
      (4L, "z" * base.length)))
    val pairs = Dedup.qNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("inter_n"), r.getAs[Long]("union_n")))
    assert(pairs.nonEmpty)
    val bucketed = pairs.map { case (a, b, i, u) => (a, b, i * 1000 / u / 100) }
    val got = Dedup.qDedupSweep(spark, dir).collect()
      .map(r => r.getAs[Long]("threshold_permille") ->
        ((r.getAs[Long]("pairs_ge"), r.getAs[Long]("docs_touched_ge"))))
      .toMap
    got.keys.foreach { t =>
      val sel = bucketed.filter(_._3 * 100 >= t)
      val docs = sel.flatMap(p => Seq(p._1, p._2)).distinct
      assert(got(t) == ((sel.length.toLong, docs.length.toLong)), s"t=$t")
    }
    // the exact-dup pair pins the t=1000 row; the curve is multi-level
    assert(got(1000L)._1 >= 1L)
    assert(got.size >= 2)
    // curve is non-increasing in t on both measures
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.map(_._1) == sorted.map(_._1).sorted.reverse)
    assert(sorted.map(_._2) == sorted.map(_._2).sorted.reverse)
  }

  test("qZipfSlope: exact least-squares on a hand corpus; fixture slope plausible") {
    // freqs 8,4,2,1 → y = (3000,2000,1000,0) exactly; x = ⌊1000·log2(rank)⌋
    // = (0,1000,1584,2000); closed form gives −1459 (truncation toward 0)
    val dir = writeDocs(Seq(0L -> "a a a a a a a a b b b b c c d"))
    val r = TextStats.qZipfSlope(spark, dir).collect()
    spark.catalog.clearCache()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_types") === 4L)
    assert(r.head.getAs[Long]("slope_milli") === -1459L)
    // the near-uniform synthetic fixture must read FLAT (≫ −1000)
    val f = TextStats.qZipfSlope(spark, "/root/testdata/sf0.001").collect().head
    assert(f.getAs[Long]("slope_milli") < 0)
    assert(f.getAs[Long]("slope_milli") > -600)
  }

  test("qQualityDupCorr: strata partition the planted-clone corpus; dup count exact") {
    val sf = "/root/testdata/sf0.001"
    val r = TextStats.qQualityDupCorr(spark, sf).collect()
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    val nBase = base.count()
    val nClones = base.filter(pmod(col("doc_id"), lit(17)) === 0).count()
    // strata partition the corpus (base + planted clones)
    assert(r.map(_.getAs[Long]("n_docs")).sum === nBase + nClones)
    assert(r.forall(x => { val p = x.getAs[Long]("n_pass"); p >= 0 && p <= 4 }))
    // duplicate total equals the independently-computed membership of
    // >1-sized fingerprint groups over the same cloned corpus
    val corpus = base.unionAll(
      base.filter(pmod(col("doc_id"), lit(17)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val expectDup = corpus.select(md5(col("text")).as("fp"))
      .groupBy("fp").count().filter(col("count") > 1)
      .agg(coalesce(sum("count"), lit(0L))).collect()(0).getLong(0)
    assert(r.map(_.getAs[Long]("n_dup")).sum === expectDup)
    assert(expectDup >= 2 * nClones) // every clone makes a >=2 group
  }

  test("qHeapsCurve: hand-computable growth curve; fixture totals conserve") {
    // 4 docs → blk = doc_id·32 div 4 = doc_id·8. Types first appear:
    // a,b@0  c@1  d@3. Tokens per doc: 2,2,2,1.
    val dir = writeDocs(Seq(
      0L -> "a b", 1L -> "a c", 2L -> "a b", 3L -> "d"))
    val rows = TextStats.qHeapsCurve(spark, dir).collect().map(r =>
      (r.getAs[Long]("blk"), r.getAs[Long]("n_new_types"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_vocab"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("ttr_micro")))
    spark.catalog.clearCache()
    assert(rows.toSeq == Seq(
      (0L, 2L, 2L, 2L, 2L, 1000000L),
      (8L, 1L, 2L, 3L, 4L, 750000L),
      (16L, 0L, 2L, 3L, 6L, 500000L),
      (24L, 1L, 1L, 4L, 7L, 571428L)), rows.mkString(","))
    // real fixture: final point equals corpus totals, cumulative monotone
    val sf = "/root/testdata/sf0.001"
    val r = TextStats.qHeapsCurve(spark, sf).collect()
    val words = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("w")) > 0)
    assert(r.last.getAs[Long]("cum_vocab") === words.distinct().count())
    assert(r.last.getAs[Long]("cum_tokens") === words.count())
    val cv = r.map(_.getAs[Long]("cum_vocab"))
    assert(cv.toSeq === cv.toSeq.sorted)
  }

  test("qClusterSplit: clone clusters never straddle splits; splits partition the corpus") {
    // three exact-clone families + singletons: family members MUST land
    // in one split, regardless of how doc-id hashing would scatter them
    val fam = "the quick brown fox jumps over the lazy dog near the old gate " * 3
    val fam2 = "pack my box with five dozen liquor jugs before the night ends " * 3
    val fam3 = "how vexingly quick daft zebras jump over the fence at dawn ok " * 3
    val dir = writeDocs(
      (1L to 4L).map(i => (i, fam)) ++
        (5L to 8L).map(i => (i, fam2)) ++
        (9L to 12L).map(i => (i, fam3)) ++
        Seq((13L, "z" * 100), (14L, "q " + ("y" * 98))))
    val r = graft.operators.Dedup.qClusterSplit(spark, dir).collect()
    assert(r.map(_.getAs[Long]("cross_split_pairs")).forall(_ == 0L),
      "a near-dup pair straddling splits breaks the structural guarantee")
    assert(r.map(_.getAs[Long]("n_docs")).sum === 14L)
    assert(r.map(_.getAs[Long]("share_permille")).sum <= 1000L)
    // every clone family is in exactly one split: replay from components
    val comp = graft.operators.Dedup.qDedupComponents(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    Seq(1L to 4L, 5L to 8L, 9L to 12L).foreach { f =>
      assert(f.map(comp).distinct.size === 1, s"family $f must be one component")
    }
  }
}
