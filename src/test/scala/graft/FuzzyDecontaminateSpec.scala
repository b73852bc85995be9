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
