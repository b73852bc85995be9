package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Semantics of the corpus-hygiene operators on inline fixtures (the
  * sf oracle gate covers testdata equivalence; these pin the exact
  * values and the plan shapes the gate can't see). */
class CorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  private def writeFixture(rows: (Long, String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("corpusops").toString
    rows.toDF("doc_id", "text", "lang")
      .select(col("doc_id"), col("text"), col("lang"),
        lit("s0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("pii_scrub: plants, counts, and redacts each PII shape exactly") {
    val dir = writeFixture(
      (1L, "table scan merge plain", "en"),
      (2L, "no pii here", "en"))
    val r = CorpusOps.qPiiScrub(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))
      .toMap
    assert(r(1L)._1 == 1L && r(1L)._2 == 1L && r(1L)._3 == 1L)
    assert(r(1L)._4 === md5hex("<EMAIL> <IP> <PHONE> plain"))
    // a clean doc: zero counts, hash of the untouched text
    assert(r(2L) === ((0L, 0L, 0L, md5hex("no pii here"))))
  }

  test("unigram_ppl: exact milli-bit surprisal, rare words dominate") {
    // tokens: a×5, rare×1 → total 6; s(a)=floor(1000·log2(6/5))=263,
    // s(rare)=floor(1000·log2(6))=2584
    val dir = writeFixture((1L, "a a a a", "en"), (2L, "a rare", "en"))
    val r = CorpusOps.qUnigramPpl(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) === ((4L, 4 * 263L, 263L)))
    assert(r(2L) === ((2L, 263L + 2584L, (263L + 2584L) / 2)))
    // small-vocab regime: the scoring join is UNHINTED (a forced
    // broadcast of every distinct token would OOM the driver on a
    // web-scale corpus), so the runtime planner must pick broadcast
    // here on its own — a tiny vocabulary that did NOT broadcast would
    // mean the statistics/AQE path regressed
    val df = CorpusOps.qUnigramPpl(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("unigram_ppl large-vocab regime: scoring survives without broadcast") {
    // forcing the planner away from broadcast simulates the O(10^9)-type
    // corpus where the model CANNOT broadcast: the query must produce
    // identical results through a shuffled join on the token key
    val dir = writeFixture((1L, "a a a a", "en"), (2L, "a rare", "en"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df = CorpusOps.qUnigramPpl(spark, dir)
      val r = df.collect()
        .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
      assert(r(1L) === ((4L, 4 * 263L, 263L)))
      assert(r(2L) === ((2L, 263L + 2584L, (263L + 2584L) / 2)))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("tokenizer_fertility: bytes and tokens aggregate per language") {
    val dir = writeFixture(
      (1L, "ab cd", "en"),   // 2 tokens, 5 bytes
      (2L, "x y z", "en"),   // 3 tokens, 5 bytes
      (3L, "hallo", "de"))   // 1 token,  5 bytes
    val r = CorpusOps.qTokenizerFertility(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r("en") === ((2L, 5L, 10L, 500000L)))
    assert(r("de") === ((1L, 1L, 5L, 200000L)))
  }

  test("char_entropy: exact milli-bits; uniform two-symbol text = 1 bit") {
    // "aabb": p(a)=p(b)=1/2 → each term floor(-1000·0.5·log2(0.5))=500
    // "aaaa": single symbol → entropy 0
    val dir = writeFixture((1L, "aabb", "en"), (2L, "aaaa", "en"))
    val r = CorpusOps.qCharEntropy(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) === ((4L, 2L, 1000L)))
    assert(r(2L) === ((4L, 1L, 0L)))
  }

  test("winnowing guarantee: a shared >=6-word passage yields a shared fingerprint") {
    // winnowing with k=3 (grams) and w=4 (window) guarantees any match
    // of length >= w+k-1 = 6 words produces at least one common
    // fingerprint (Schleimer et al. 2003, the local-algorithm property)
    val shared = "alpha beta gamma delta epsilon zeta"
    val dir = writeFixture(
      (1L, s"one two three $shared", "en"),
      (2L, s"$shared four five six", "en"),
      (3L, "totally different words here now indeed", "en"))
    val fps = CorpusOps.qWinnowing(spark, dir).collect()
    assert(fps.nonEmpty, "docs 1 and 2 share a 6-word passage → must share a fingerprint")
    assert(fps.forall(_.getLong(1) == 2L), "doc 3 shares nothing")
    assert(fps.forall(_.getString(0).matches("[0-9a-f]{32}")))
  }

  test("short or null documents are handled, not crashed on") {
    val dir = writeFixture((1L, "tiny doc", "en")) // < 6 words
    assert(CorpusOps.qWinnowing(spark, dir).collect().isEmpty)
    assert(CorpusOps.qCharEntropy(spark, dir).collect().length === 1)
  }

  test("substring_spans: first occurrence kept, later and intra-doc repeats spanned, overlaps merged") {
    val dir = writeFixture(
      // doc 1 is the corpus-first occurrence of "a..h" — never duplicated
      (1L, "a b c d e f g h x y z", "en"),
      // doc 2 repeats doc 1's 8-gram at word 4 → one span of exactly 8
      (2L, "p q r a b c d e f g h k", "en"),
      // doc 3 repeats ITS OWN first 8 words at position 9 (intra-doc)
      (3L, "m n o p q r s t m n o p q r s t", "en"),
      // doc 4 repeats doc 1's words 1-11: four overlapping duplicated
      // grams (pos 1-4) must merge into ONE span covering words 1-11
      (4L, "a b c d e f g h x y z w", "en"),
      (5L, "too short", "en"))
    val r = CorpusOps.qSubstringSpans(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r(1L) === ((0L, 0L, 11L, 0L)))
    assert(r(2L) === ((1L, 8L, 12L, 666L)))
    assert(r(3L) === ((1L, 8L, 16L, 500L)))
    assert(r(4L) === ((1L, 11L, 12L, 916L)))
    assert(r(5L) === ((0L, 0L, 2L, 0L)))
  }

  test("dedup_rewrite: spanned words cut, survivors reassemble, full copy empties") {
    val dir = writeFixture(
      (1L, "a b c d e f g h x y z", "en"),      // corpus-first — untouched
      (2L, "p q r a b c d e f g h k", "en"),     // span pos 4-11 → "p q r k"
      (3L, "a b c d e f g h", "en"),             // exact repeat → fully removed
      (4L, "too short", "en"))                   // <8 words — untouched
    val r = CorpusOps.qDedupRewrite(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getString(3)))
      .toMap
    assert(r(1L) === ((11L, 11L, md5hex("a b c d e f g h x y z"))))
    assert(r(2L) === ((12L, 4L, md5hex("p q r k"))))
    assert(r(3L) === ((8L, 0L, md5hex(""))))
    assert(r(4L) === ((2L, 2L, md5hex("too short"))))
  }

  test("winnowing plan hashes each gram exactly once") {
    // regression pin for the r8 collapse blow-up: projection collapse
    // inlining the gram construction into multiple consumers shows up
    // as md5 appearing more than once in the physical plan — the
    // explode+lead+window shape must keep exactly one md5 projection
    val dir = writeFixture((1L, "a b c d e f g h", "en"))
    val plan = CorpusOps.qWinnowing(spark, dir).queryExecution.executedPlan.toString
    assert("md5".r.findAllIn(plan).size == 1, plan)
  }

  test("substring_spans: corpus order survives a >1M-word document") {
    // regression pin for the retired packed key k = doc_id*1e6 + pos,
    // which inverted corpus order once pos spilled past the multiplier:
    // doc 1 carries the shared 8-gram at pos > 1,000,000 (packed key
    // 2,000,004), doc 2 at pos 1 (packed key 2,000,001 — WRONGLY
    // smaller). The struct-ordered min must keep doc 1 as the first
    // occurrence and span only doc 2.
    val filler = (0 until 1000000).map(i => "a" + i).mkString(" ")
    val magic = "m1 m2 m3 m4 m5 m6 m7 m8"
    val dir = writeFixture(
      (1L, filler + " " + magic, "en"),
      (2L, magic + " z1 z2 z3", "en"))
    val r = CorpusOps.qSubstringSpans(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r(1L) === ((0L, 0L, 1000008L, 0L)))
    assert(r(2L) === ((1L, 8L, 11L, 727L)))
  }

  test("canonicalUrl: adversarial spellings, exact forms, idempotence") {
    val raws = Seq(
      "HTTPS://WWW.Example.COM:443/Docs/2?z=1&utm_source=feed&a=2#top",
      "https://www.example.com/Docs/2?a=2&ref=rss&z=1",
      "HTTP://Example.com:80/x?utm_a=1&utm_b=2",     // tracking-only → bare
      "http://example.com/x",                        // no query at all
      "https://example.com/UPPER/Case?b=2&a=1#frag", // path case kept, params sorted
      "ftp://Host.Net/file",                         // non-http scheme passes through
      "https://example.com:80/a")                    // NON-default port survives
    val df = raws.toDF("url")
      .select(col("url"), CorpusOps.canonicalUrl(col("url")).as("c1"))
      .select(col("url"), col("c1"), CorpusOps.canonicalUrl(col("c1")).as("c2"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val canon = rows.map { case (u, c, _) => u -> c }.toMap
    assert(canon(raws(0)) === "https://example.com/Docs/2?a=2&z=1")
    assert(canon(raws(1)) === "https://example.com/Docs/2?a=2&z=1")
    assert(canon(raws(2)) === "http://example.com/x")
    assert(canon(raws(3)) === "http://example.com/x")
    assert(canon(raws(4)) === "https://example.com/UPPER/Case?a=1&b=2")
    assert(canon(raws(5)) === "ftp://host.net/file")
    // https on port 80 is a DIFFERENT origin than https on 443 — only
    // the scheme's own default port collapses
    assert(canon(raws(6)) === "https://example.com:80/a")
    // idempotence: a canonical form is its own canonical form
    rows.foreach { case (u, c1, c2) => assert(c1 === c2, s"not idempotent for $u") }
  }

  test("gram_novelty: first corpus appearance wins, restated grams are not novel") {
    val dir = writeFixture(
      (1L, "a b c d", "en"),   // grams abc, bcd — both first here
      (2L, "a b c x", "en"),   // abc restates doc 1; bcx is new
      (3L, "a b", "en"))       // too short for any gram
    val r = CorpusOps.qGramNovelty(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) === ((2L, 2L, 1000L)))
    assert(r(2L) === ((2L, 1L, 500L)))
    assert(r(3L) === ((0L, 0L, 0L)))
  }

  test("temperature_mix: sqrt-damped weights in exact integer micro-units") {
    // source A: 4 tokens, source B: 16 → s_milli 2000 / 4000, total 6000
    val dir = java.nio.file.Files.createTempDirectory("tempmix").toString
    Seq((1L, "a b c d", "en", "A"), (2L, ("x " * 15).trim + " y", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.TextStats.qTemperatureMix(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r("A") === ((1L, 4L, 333333L, 3333L)))
    assert(r("B") === ((1L, 16L, 666666L, 6666L)))
  }

  test("source_kl: drift is positive, identical-to-corpus source near zero") {
    // source B == corpus mix would give KL 0; here A is x-heavy and B
    // y-heavy, so both diverge positively; expected terms replicated
    // with the same double ops the query uses (±2 micro for log ulp)
    val dir = java.nio.file.Files.createTempDirectory("srckl").toString
    Seq((1L, "x x y", "en", "A"), (2L, "x y y y", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def term(cSw: Long, nS: Long, cW: Long, nTot: Long): Long = {
      val ps = cSw.toDouble / nS
      val pc = cW.toDouble / nTot
      math.floor(1000000.0 * ps * (math.log(ps / pc) / math.log(2.0))).toLong
    }
    val wantA = term(2, 3, 3, 7) + term(1, 3, 4, 7)
    val wantB = term(1, 4, 3, 7) + term(3, 4, 4, 7)
    val r = graft.operators.TextStats.qSourceKl(spark, dir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("A")._1 == 3L && r("B")._1 == 4L)
    assert(math.abs(r("A")._2 - wantA) <= 2, s"A: ${r("A")._2} vs $wantA")
    assert(math.abs(r("B")._2 - wantB) <= 2, s"B: ${r("B")._2} vs $wantB")
    // KL against a mixture containing the source is bounded below by
    // ~0 and these skewed sources must be measurably positive
    assert(r("A")._2 > 0L && r("B")._2 > 0L)
  }

  test("url_canonical: both raw spellings of a logical URL collapse to one canonical form") {
    // docs 2k and 2k+1 name the same logical URL: even ids carry casing,
    // :443, www, utm junk, shuffled params, and a fragment; odd ids the
    // clean spelling — the canonicalizer must merge each adjacent pair
    val dir = writeFixture(
      (4L, "w", "en"), (5L, "w", "en"),    // pair → Docs/2?a=2&z=1
      // page 5 is a tracking-only page: even doc carries ONLY utm/ref
      // params, odd doc no query at all — both must collapse to the
      // BARE canonical with no dangling '?'
      (10L, "w", "en"), (11L, "w", "en"),  // pair → Docs/5
      (204L, "w", "en"))                   // (204/2)%25=2,(204/2)%4=2 → joins the first group
    val r = CorpusOps.qUrlCanonical(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq(
      ("https://example.com/Docs/2?a=2&z=1", 3L, 4L),
      ("https://example.com/Docs/5", 2L, 10L)))
    assert(!r.exists(_._1.endsWith("?")))
    // canonical forms carry no tracking params, port, www, or fragment;
    // scheme+host are lowercased (the PATH keeps its case — 'Docs' —
    // per RFC 3986 §6.2.2.1 only scheme and host are case-insensitive)
    assert(r.forall { case (u, _, _) =>
      val schemeHost = u.substring(0, u.indexOf('/', "https://".length))
      !u.contains("utm") && !u.contains("ref=") && !u.contains(":443") &&
        !u.contains("www.") && !u.contains("#") &&
        schemeHost == schemeHost.toLowerCase })
  }
}
