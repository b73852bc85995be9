package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextStats}

/** Pins the r13 cross-set / cross-distribution audits on planted
  * fixtures: minhash fuzzy decontamination ([[Dedup]]), pairwise
  * Jensen–Shannon divergence and its float contract ([[TextStats]]).
  * The sf replay proves Spark↔DuckDB equality; these prove the rules
  * are the intended ones. */
class FuzzyDecontaminateSpec extends SparkSpec {

  import spark.implicits._

  // md5("eval|41") % 20 == 0 — the one eval id under 50 (the same
  // deterministic split q_decontaminate uses)
  private val EvalId = 41L

  private def writeDocs(rows: (Long, String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("fuzzy").toString
    rows.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("fuzzy decontaminate: identical train twin flagged, unrelated doc not") {
    // the shingle pipeline strides 5 chars; an identical text shares
    // every shingle, hence every band — an unrelated text shares none
    val leak = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different content with nothing shared at all here"
    val dir = writeDocs(
      (EvalId, leak, "s0"),  // eval member
      (1L, leak, "s0"),      // exact twin in train: must flag
      (2L, other, "s0"))     // unrelated train doc: must not flag
    val got = Dedup.qFuzzyDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_eval_hits"), r.getAs[Long]("first_eval_match"))))
      .toMap
    assert(got.keySet === Set(1L), "only the twin is flagged")
    // both bands collide but the (train, eval) pair counts ONCE
    assert(got(1L) === ((1L, EvalId)))
  }

  test("fuzzy decontaminate: eval members never appear as flagged train docs") {
    val t = "shared text body that is identical across both documents here"
    val dir = writeDocs((EvalId, t, "s0"), (1L, t, "s0"), (3L, t, "s0"))
    val flagged = Dedup.qFuzzyDecontaminate(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(flagged === Set(1L, 3L))
  }

  test("js divergence: identical sources measure exactly zero") {
    val t = "alpha beta gamma delta"
    val dir = writeDocs((1L, t, "sa"), (2L, t, "sb"))
    val r = TextStats.qJsDivergence(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("klm_a_micro") === 0L)
    assert(r.head.getAs[Long]("klm_b_micro") === 0L)
    assert(r.head.getAs[Long]("js2_micro") === 0L)
  }

  test("js divergence: disjoint vocabularies measure exactly 1 bit per leg") {
    // 2 words each, counts divide 1e6 evenly -> no flooring loss:
    // each leg is exactly log2(2) = 1e6 micro-bits, js2 = 2e6
    val dir = writeDocs((1L, "aa bb", "sa"), (2L, "cc dd", "sb"))
    val r = TextStats.qJsDivergence(spark, dir).collect().head
    assert(r.getAs[Long]("klm_a_micro") === 1000000L)
    assert(r.getAs[Long]("klm_b_micro") === 1000000L)
    assert(r.getAs[Long]("js2_micro") === 2000000L)
  }

  test("js divergence: sf replay against a float brute within flooring slack") {
    val sf = "/root/testdata/sf0.001"
    val words = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = words.groupBy(_._1)
      .view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val tots = bySrc.view.mapValues(_.values.sum).toMap
    val got = TextStats.qJsDivergence(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_tokens_a"), r.getAs[Long]("n_tokens_b"),
          r.getAs[Long]("js2_micro")))).toMap
    val srcs = bySrc.keys.toSeq.sorted
    assert(got.size === srcs.length * (srcs.length - 1) / 2)
    for (i <- srcs.indices; j <- (i + 1) until srcs.length) {
      val (sa, sb) = (srcs(i), srcs(j))
      val (na, nb) = (tots(sa).toDouble, tots(sb).toDouble)
      val vocab = bySrc(sa).keySet ++ bySrc(sb).keySet
      var kl = 0.0
      vocab.foreach { w =>
        val ca = bySrc(sa).getOrElse(w, 0L).toDouble
        val cb = bySrc(sb).getOrElse(w, 0L).toDouble
        val m = (ca / na + cb / nb) / 2
        if (ca > 0) kl += (ca / na) * (math.log(ca / na / m) / math.log(2))
        if (cb > 0) kl += (cb / nb) * (math.log(cb / nb / m) / math.log(2))
      }
      val (gna, gnb, js2) = got((sa, sb))
      assert(gna === tots(sa) && gnb === tots(sb), s"$sa/$sb")
      val js2Float = kl * 1e6
      // per-term flooring loses < 1 micro-bit per vocab word per leg
      assert(js2 <= js2Float + 1 && js2 >= js2Float - 2.0 * vocab.size,
        s"$sa/$sb: $js2 vs $js2Float")
      assert(js2 >= 0 - 2L * vocab.size && js2 <= 2000000L)
    }
  }

  test("lang mix: block-level cascade finds the minority block a doc-level label averages away") {
    // doc 1: blocks of 10 tokens — block 1 'the'-heavy (en), block 2
    // 'data'-heavy (dat) -> majority en (tie count 1=1 breaks to the
    // lexicographically... count DESC then guess ASC: 'dat' < 'en' so
    // a 1-1 tie picks 'dat'. Use 2 en blocks vs 1 dat so majority=en.
    val enBlk = "the w the w the w w w w w"           // 10 tokens, en
    val datBlk = "data w data w data w w w w w"       // 10 tokens, dat
    val dir = writeDocs(
      (1L, s"$enBlk $enBlk $datBlk", "s0"), // 3 blocks: en,en,dat
      (2L, s"$enBlk $enBlk", "s0"))         // pure en
    val got = graft.operators.TextStats.qLangMix(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_blocks"), r.getAs[String]("majority_guess"),
          r.getAs[Long]("n_minority"), r.getAs[Long]("mix_permille")))).toMap
    assert(got(1L) === ((3L, "en", 1L, 333L)))
    assert(got(2L) === ((2L, "en", 0L, 0L)))
  }

  test("interarrival fit: lockstep arrivals score far from exponential") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("iaf").toString
    // one user, 41 events exactly 100 s apart: all gaps = 100, mean
    // 100; exponential CDF at 100 is 1-1/e ~ .632 but the empirical
    // CDF jumps 0 -> 1 there: D = .632 -> ks_milli 632
    val t0 = 1700000000L
    (0 until 41).map(i =>
        (i.toLong, new java.sql.Timestamp((t0 + 100L * i) * 1000),
          7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.operators.Sequences.qInterarrivalFit(spark, dir)
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_gaps") === 40L)
    assert(r.head.getAs[Long]("mean_gap_milli") === 100000L)
    val exp632 = math.floor(1000.0 * math.max(
      math.abs(1.0 - (1.0 - math.exp(-1.0))),
      math.abs(0.0 - (1.0 - math.exp(-1.0))))).toLong
    assert(r.head.getAs[Long]("ks_milli") === exp632)
    assert(r.head.getAs[Long]("ks_milli") === 632L)
  }

  test("theil-sen: one outlier day moves the median slope by a rank, not a mile") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tsen").toString
    // days 0..4 with daily cents 100,200,300,400,10000 (one flash day)
    // pairwise slopes (cents/day): 10 pairs; clean trend 100/day, the
    // outlier contributes 4 big slopes -> median stays 100/day
    val t0 = 86400L * 20000 // day-aligned epoch
    val days = Seq(0L -> 1.00, 1L -> 2.00, 2L -> 3.00, 3L -> 4.00,
      4L -> 100.00)
    days.zipWithIndex.map { case ((day, v), i) =>
      (i.toLong, new java.sql.Timestamp((t0 + day * 86400 + 10) * 1000),
        1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.operators.Sequences.qTheilSen(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_days") === 5L)
    assert(r.head.getAs[Long]("n_pairs") === 10L)
    // slopes micro-cents/day sorted: 100/day clean pairs dominate the
    // lower median (rank (10+1) div 2 = 5)
    val cents = days.map { case (d, v) => (d, math.round(v * 100)) }
    val slopes = (for {
      i <- cents.indices; j <- (i + 1) until cents.length
    } yield {
      val dy = cents(j)._2 - cents(i)._2
      val dx = cents(j)._1 - cents(i)._1
      math.floorDiv(dy * 1000000L, dx)
    }).sorted
    assert(r.head.getAs[Long]("ts_slope_micro_cents") === slopes(4))
    assert(slopes(4) === 100000000L, "median slope is the clean 100 cents/day")
  }

  test("theil-sen: negative slopes floor identically to the oracle rule") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tsenneg").toString
    val t0 = 86400L * 20000
    // 3 days, strictly falling with a non-divisible drop: slopes
    // (cents/day): (150-301)/1 = -151, (37-301)/2 = -132, (37-150)/1
    // = -113; median rank 2 -> floor(-264/2) = -132
    val days = Seq(0L -> 3.01, 1L -> 1.50, 2L -> 0.37)
    days.zipWithIndex.map { case ((day, v), i) =>
      (i.toLong, new java.sql.Timestamp((t0 + day * 86400) * 1000),
        1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.operators.Sequences.qTheilSen(spark, dir).collect().head
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Long]("ts_slope_micro_cents") === -132000000L)
  }

  test("winsorized mean: the clamp prices the outlier; clean data clamps nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winsor").toString
    // sa: 19 docs of 100 chars + one 10000-char monster
    // sb: 20 docs all exactly 100 chars (degenerate fences p05=p95=100)
    val rows = (1L to 19L).map(i => (i, "sa", 100L)) ++ Seq((20L, "sa", 10000L)) ++
      (21L to 40L).map(i => (i, "sb", 100L))
    rows.map { case (id, src, len) => (id, "t", "en", src, len) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Relevance.qWinsorizedMean(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val sa = got("sa")
    // percentile_disc(.05) over 20 sorted values = the 1st (100);
    // .95 = the 19th (100) -> the monster clamps to 100
    assert(sa.getAs[Long]("p05") === 100L && sa.getAs[Long]("p95") === 100L)
    assert(sa.getAs[Long]("mean_milli") === (19L * 100 + 10000) * 1000 / 20)
    assert(sa.getAs[Long]("winsor_mean_milli") === 100000L)
    assert(sa.getAs[Long]("n_clamped") === 1L)
    val sb = got("sb")
    assert(sb.getAs[Long]("mean_milli") === 100000L)
    assert(sb.getAs[Long]("winsor_mean_milli") === 100000L)
    assert(sb.getAs[Long]("n_clamped") === 0L)
  }

  test("changepoint segments: a clean step splits at the boundary; flat halves score zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cpseg").toString
    val t0 = 86400L * 20000
    // days 0..9 one event/day, days 10..19 five events/day
    val evs = (0 until 10).map(d => Seq.fill(1)(d)) ++
      (10 until 20).map(d => Seq.fill(5)(d))
    evs.flatten.zipWithIndex.map { case (d, i) =>
      (i.toLong, new java.sql.Timestamp((t0 + d * 86400 + 100) * 1000),
        1L, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Sequences.qChangepointSegments(spark, dir)
      .collect().map(r => (r.getAs[Long]("level"), r.getAs[Long]("segment")) ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("cp_day"),
          r.getAs[Long]("cusum_permille")))).toMap
    assert(got.keySet === Set((1L, 0L), (2L, 0L), (2L, 1L)))
    // level 1: |s| bows maximally at the last low-rate day (day 9)
    val (nd, cp, pm) = got((1L, 0L))
    assert(nd === 20L && cp === 20000L + 9L)
    assert(pm > 0L)
    // both halves are FLAT: every deviation is zero, permille 0,
    // argmax ties to the earliest day of the half
    assert(got((2L, 0L)) === ((10L, 20000L, 0L)))
    assert(got((2L, 1L)) === ((10L, 20010L, 0L)))
  }

  test("rbo: identical rankings score the full weight mass; disjoint score 0") {
    // token count and char count produce the SAME ranking when texts
    // are single repeated chars (len tracks tokens)
    val same = (1L to 12L).map(i =>
      (i, Seq.fill(i.toInt + 1)("w").mkString(" "), "sa"))
    // rankings DISJOINT in their top-10: 22 docs where token count
    // strictly falls with i while char count strictly rises (one huge
    // pad token + i-dependent tails) — token top-10 is i=1..10, char
    // top-10 is i=13..22
    val inv = (1L to 22L).map { i =>
      val t = 23 - i.toInt // token count
      val text = ("y" * (10000 * i.toInt)) + Seq.fill(t - 1)(" x").mkString
      (100L + i, text, "sb")
    }
    val dir = writeDocs((same ++ inv): _*)
    val got = graft.operators.Relevance.qRboRankings(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("overlap_10"), r.getAs[Long]("rbo_ppm")))).toMap
    assert(got("sa") === ((10L, 999995L))) // sum of the pinned weights
    assert(got("sb")._1 === 0L && got("sb")._2 === 0L)
  }
}
