package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Dedup, Evaluation, Sequences, Similarity}

/** Planted-fixture semantics for the r14 audit operators —
  * eventually-follows, Little's law, seasonal anomalies, Spearman,
  * mutual information, Jelinek-Mercer, LOF, and the SNB blocking
  * scorecard. (The sf replay proves Spark↔DuckDB equality; these prove
  * the numbers are the INTENDED ones on cases small enough to check by
  * hand.) */
class PipelineAuditSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), prefix).toString

  private def writeEvents(dir: String, rows: Seq[(Long, Long, Long, String)]): Unit =
    rows.map { case (id, sec, user, typ) =>
      (id, new java.sql.Timestamp(sec * 1000), user, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String, Long)]): Unit =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("eventually-follows: endpoint rule matches the hand trace") {
    val dir = tmp("evf")
    // u1: A@0, B@10, A@20; u2: B@0, A@10
    writeEvents(dir, Seq(
      (0L, 0L, 1L, "A"), (1L, 10L, 1L, "B"), (2L, 20L, 1L, "A"),
      (3L, 0L, 2L, "B"), (4L, 10L, 2L, "A")))
    val got = Sequences.qEventuallyFollows(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("support_permille")))).toMap
    // u1: A->A (0<20), A->B (0<10), B->A (10<20); u2: B->A (0<10)
    assert(got === Map(
      ("A", "A") -> ((1L, 500L)),
      ("A", "B") -> ((1L, 500L)),
      ("B", "A") -> ((2L, 1000L))))
  }

  test("eventually-follows contains directly-follows on the sf fixture") {
    val sf = "/root/testdata/sf0.001"
    val ef = Sequences.qEventuallyFollows(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_users"))
      .toMap
    val df = Sequences.qEventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_users"))
      .toMap
    // any user with an adjacent a->b also has a eventually-before b
    df.foreach { case (k, n) =>
      assert(ef.getOrElse(k, 0L) >= n, s"pair $k: eventually < directly")
    }
  }

  test("little's law: planted two-session week ledger balances exactly") {
    val dir = tmp("ll")
    val W = 604800L
    writeEvents(dir, Seq(
      // u1: two isolated events 2 weeks apart -> two zero-length sessions
      (0L, 0L, 1L, "A"), (1L, 2 * W + 100L, 1L, "A"),
      // u2: gap exactly = W merges -> one session [100, W+100)
      (2L, 100L, 2L, "A"), (3L, W + 100L, 2L, "A")))
    val got = Sequences.qLittlesLaw(spark, dir).collect()
      .map(r => r.getAs[Long]("week") ->
        ((r.getAs[Long]("n_started"), r.getAs[Long]("dur_sec"),
          r.getAs[Long]("l_milli"), r.getAs[Long]("lw_milli"),
          r.getAs[Long]("resid_milli")))).toMap
    // week 0: u1 session (dur 0) + u2 session start; u2 overlap W-100
    assert(got(0L) === ((2L, W, (W - 100) * 1000 / W, 1000L,
      (W - 100) * 1000 / W - 1000L)))
    // week 1: only u2's tail 100 s of presence, no starts
    assert(got(1L) === ((0L, 0L, 0L, 0L, 0L)))
    // week 2: u1's second zero-length session
    assert(got(2L) === ((1L, 0L, 0L, 0L, 0L)))
  }

  test("hourly anomaly: a planted 5x spike tops the ranking with exact z2") {
    val dir = tmp("anom")
    // five hour buckets exactly 168 h apart (same dow+hour cell):
    // counts 10,10,10,10,50 -> for c=50: (5*50-90)^2*1000/(5*2900-8100)
    // = 160^2*1000/6400 = 4000; for c=10: 40^2*1000/6400 = 250
    val rows = for {
      wk <- 0 until 5
      i <- 0 until (if (wk == 4) 50 else 10)
    } yield ((wk * 100 + i).toLong, wk * 168L * 3600L + 60L, 1L, "A")
    writeEvents(dir, rows)
    val got = Sequences.qHourlyAnomaly(spark, dir).collect()
      .map(r => (r.getAs[Long]("hour_bucket"), r.getAs[Long]("n_events"),
        r.getAs[Long]("cell_buckets"), r.getAs[Long]("z2_milli")))
    assert(got.length === 5)
    assert(got.head._2 === 50L && got.head._4 === 4000L)
    assert(got.tail.forall(t => t._2 === 10L && t._4 === 250L))
    assert(got.forall(_._3 === 5L))
  }

  test("spearman: reversed ranking scores -1, concordant scores +1") {
    val dir = tmp("spear")
    def toks(n: Int): String = Seq.fill(n)("w").mkString(" ")
    writeDocs(dir,
      // source rev: n_chars ascending 1..4, token count descending 4..1
      Seq((1L, toks(4), "en", "rev", 1L), (2L, toks(3), "en", "rev", 2L),
        (3L, toks(2), "en", "rev", 3L), (4L, toks(1), "en", "rev", 4L),
        // source conc: both ascending together
        (5L, toks(1), "en", "conc", 1L), (6L, toks(2), "en", "conc", 2L),
        (7L, toks(3), "en", "conc", 3L)))
    val got = Evaluation.qSpearmanCorr(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("rho_micro")))).toMap
    assert(got === Map("rev" -> ((4L, -1000000L)),
      "conc" -> ((3L, 1000000L))))
  }

  test("mutual info: independent grid scores 0, siloed diagonal scores min-entropy") {
    val ind = tmp("mi-ind")
    writeDocs(ind,
      Seq(("en", "s1"), ("en", "s2"), ("de", "s1"), ("de", "s2"))
        .zipWithIndex.flatMap { case ((l, s), c) =>
          (1 to 25).map(i => (c * 25L + i, "t", l, s, 1L)) })
    val gi = Evaluation.qMutualInfo(spark, ind).collect().head
    assert(gi.getAs[Long]("mi_micro") === 0L)
    assert(gi.getAs[Long]("h_lang_micro") === 1000000L)
    assert(gi.getAs[Long]("nmi_permille") === 0L)

    val sil = tmp("mi-sil")
    writeDocs(sil,
      Seq(("en", "s1"), ("de", "s2")).zipWithIndex.flatMap { case ((l, s), c) =>
        (1 to 50).map(i => (c * 50L + i, "t", l, s, 1L)) })
    val gs = Evaluation.qMutualInfo(spark, sil).collect().head
    assert(gs.getAs[Long]("mi_micro") === 1000000L)
    assert(gs.getAs[Long]("nmi_permille") === 1000L)
  }

  test("jelinek-mercer: identical train/eval bigram scores log2(4/3)") {
    // find doc ids on each side of the jm| 90/10 split by replicating
    // md5Long (first 15 hex chars of md5 as a Long)
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val ids = (1L to 200L)
    val evalId = ids.find(i => h(s"jm|$i") % 10 == 0).get
    val trainIds = ids.filter(i => h(s"jm|$i") % 10 != 0).take(10)
    val dir = tmp("jm")
    writeDocs(dir,
      (trainIds :+ evalId).map(i => (i, "x y", "en", "s", 3L)))
    val got = CorpusOps.qJelinekMercer(spark, dir).collect()
    assert(got.length === 1 && got.head.getAs[Long]("doc_id") === evalId)
    // c12 = c1 = c2 = 10, N = 20: S = (10*20 + 10*10)/(2*10*20) = 3/4
    // -> floor(1000*log2(4/3)) = 415
    assert(got.head.getAs[Long]("n_bigrams") === 1L)
    assert(got.head.getAs[Long]("n_unseen") === 0L)
    assert(got.head.getAs[Long]("bits_milli") === 415L)
  }

  test("lof: a planted orthogonal outlier tops the density ranking") {
    val dir = tmp("lof")
    def vec(hot: Int, eps: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f); a(hot) = 1f
      eps.foreach { case (i, v) => a(i) = v }; a
    }
    // 7 near-duplicates around e0 (distinct via a tiny dim-1 bump)
    // + 1 orthogonal outlier at e2
    val rows = (0 until 7).map(i =>
      (i.toLong, vec(0, 1 -> (0.001f * (i + 1))), 0)) :+ ((7L, vec(2), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("q_lof")(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("lof_milli")))
    assert(got.length === 8)
    assert(got.head._1 === 7L, "outlier must rank first")
    assert(got.head._2 > 2000L, s"outlier lof ${got.head._2} not extreme")
    assert(got.tail.forall(_._2 < 2000L), "cluster points must stay low")
  }

  test("hyperband: eta=3 rungs keep 9/3/1 with equal unit budgets") {
    val dir = tmp("hb")
    writeDocs(dir, (1 to 9).map(i =>
      (i.toLong, "t", "en", "s", i * 10L)))
    val got = graft.operators.Selection.qHyperbandPlan(spark, dir).collect()
      .map(r => r.getAs[Long]("rung") ->
        ((r.getAs[Long]("n_kept"), r.getAs[Long]("cutoff_score"),
          r.getAs[Long]("unit_budget"))))
    // n=9: rung 0 keeps 9 (cutoff 10), rung 1 keeps 3 (cutoff 70),
    // rung 2 keeps 1 (cutoff 90), rung 3 keeps 0 -> absent;
    // every present rung costs the same 9 units
    assert(got.toMap === Map(
      0L -> ((9L, 10L, 9L)), 1L -> ((3L, 70L, 9L)), 2L -> ((1L, 90L, 9L))))
  }

  test("weighted top-k sample: exact k, deterministic, heavy doc always in") {
    val dir = tmp("ates")
    // 9 weight-1 docs + 1 doc at weight 10^6: the Gumbel key gap
    // (~20 bits) cannot be crossed by any 60-bit md5 uniform here
    writeDocs(dir, (1 to 9).map(i => (i.toLong, "t", "en", "s", 1L))
      :+ ((10L, "t", "en", "s", 1000000L)))
    val a = graft.operators.Selection.qWeightedTopkSample(spark, dir).collect()
    val b = graft.operators.Selection.qWeightedTopkSample(spark, dir).collect()
    assert(a.length === 5, "exactly k survivors")
    assert(a.map(_.getAs[Long]("doc_id")).toSeq ===
      b.map(_.getAs[Long]("doc_id")).toSeq, "deterministic across runs")
    assert(a.map(_.getAs[Long]("doc_id")).contains(10L),
      "the 10^6-weight doc must be sampled")
    val keys = a.map(_.getAs[Long]("key_micro"))
    assert(keys.sorted.reverse.toSeq === keys.toSeq, "ranked by key desc")
  }

  test("kaplan-meier: hand-traced censoring, sentinel on the last death") {
    val dir = tmp("km")
    val day10 = 864000L
    writeEvents(dir, Seq(
      // A: burst [0, 3600] (death), then a point burst at day 10 (censored)
      (0L, 0L, 1L, "A"), (1L, 3600L, 1L, "A"), (2L, day10, 1L, "A"),
      // B: single point at day 10 (censored, dur 0)
      (3L, day10, 2L, "A"),
      // C: burst [0, 7200] (death), then day 10 (censored)
      (4L, 0L, 3L, "A"), (5L, 7200L, 3L, "A"), (6L, day10, 3L, "A")))
    val got = graft.operators.Sequences.qKaplanMeier(spark, dir).collect()
      .map(r => (r.getAs[Long]("dur_sec"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_events"), r.getAs[Long]("log2_surv_micro")))
    // durations: 0 (censored x3), 3600 death, 7200 death
    // at 3600: n_risk 2, d 1 -> log2(1/2) = -1e6
    // at 7200: n_risk 1, d 1 -> all die: the -1e9 sentinel accumulates
    assert(got.toSeq === Seq(
      (3600L, 2L, 1L, -1000000L),
      (7200L, 1L, 1L, -1001000000L)))
  }

  test("burrows delta: identical sources at 0, symmetric to the odd one out") {
    val dir = tmp("bd")
    val styleA = "the of and to in a is was it for"
    val styleB = "zig zag zog zug zeg zyg zag zig zog zug"
    writeDocs(dir, Seq(
      (1L, styleA, "en", "s1", 10L), (2L, styleA, "en", "s2", 10L),
      (3L, styleB, "en", "s3", 10L)))
    val got = graft.operators.TextStats.qBurrowsDelta(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("delta_milli")).toMap
    assert(got(("s1", "s2")) === 0L, "identical styles have zero delta")
    assert(got(("s1", "s3")) === got(("s2", "s3")), "delta is symmetric")
    assert(got(("s1", "s3")) > 0L)
  }

  test("snb scorecard: bounds and truth-count consistency on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val r = Dedup.qSnbEval(spark, sf).collect().head
    val nTruth = Dedup.minhashCandidatePairs(spark, sf).count()
    assert(r.getAs[Long]("n_truth") === nTruth)
    assert(r.getAs[Long]("n_common") <=
      math.min(r.getAs[Long]("n_candidates"), r.getAs[Long]("n_truth")))
    assert(r.getAs[Long]("recall_permille") <= 1000L)
    val red = r.getAs[Long]("reduction_permille")
    assert(red >= 0L && red <= 1000L)
  }
}
